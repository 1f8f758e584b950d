package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AtomicSwap

/** Round-16: the writer-lease contract proven ACROSS PROCESSES, the
  * level the O_EXCL `Files.createFile` acquisition and pid-liveness
  * reclaim actually operate at (LeaseRaceSpec's stress runs threads in
  * ONE JVM, which a non-atomic create could still appear to pass under
  * low contention). Forks [[LeaseStressMain]] children against one
  * artifact directory; every acquire/release is an O_APPEND line in a
  * shared witness file, so mutual exclusion is verified from the
  * witness interleaving alone — no child is trusted.
  *
  * Also proves crash recovery: a child kill -9'd INSIDE the lease body
  * leaves a lease whose same-host pid is provably dead, so the next
  * writer reclaims it immediately (no staleMs wait — that window is
  * only for cross-host holders whose liveness can't be probed). */
class LeaseCrossProcessSpec extends AnyFunSuite with SparkSpec {

  private def fs =
    new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-r16-$tag-").toString

  /** Fork a LeaseStressMain child with this JVM's classpath. */
  private def fork(args: Seq[String]): Process = {
    val javaBin = sys.props("java.home") + "/bin/java"
    val opens = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ opens ++ Seq(
      "-Xmx1g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.LeaseStressMain") ++ args
    new ProcessBuilder(cmd.asJava)
      .redirectErrorStream(true)
      .redirectOutput(ProcessBuilder.Redirect.to(
        java.nio.file.Files.createTempFile("graft-child-", ".log").toFile))
      .start()
  }

  private def witnessLines(witness: java.nio.file.Path): Seq[String] =
    if (java.nio.file.Files.exists(witness))
      java.nio.file.Files.readAllLines(witness).asScala.toSeq
    else Seq.empty

  test("4 forked processes churning acquire/release on ONE artifact " +
    "never overlap inside the body — verified from the shared witness " +
    "file's ENTER/EXIT interleaving, not from any child's say-so") {
    val dir = tmp("xproc") + "/art"
    fs.mkdirs(new Path(dir))
    val witness = java.nio.file.Files.createTempFile("graft-witness-", ".log")
    val kids = 4
    val cycles = 6
    val procs = (0 until kids).map { _ =>
      fork(Seq(dir, witness.toString, "churn", cycles.toString, "5"))
    }
    procs.foreach { p =>
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        "child did not finish in time")
      assert(p.exitValue() == 0, s"child failed rc=${p.exitValue()}")
    }
    val lines = witnessLines(witness)
    assert(lines.size == kids * cycles * 2,
      s"expected ${kids * cycles} ENTER/EXIT pairs, got:\n${lines.mkString("\n")}")
    var depth = 0
    var lastEnterPid = ""
    lines.foreach { l =>
      val pid = l.split("\\s+")(1)
      if (l.startsWith("ENTER")) {
        depth += 1
        lastEnterPid = pid
        assert(depth == 1,
          s"two processes inside the lease body at once:\n${lines.mkString("\n")}")
      } else if (l.startsWith("EXIT")) {
        assert(pid == lastEnterPid,
          s"EXIT by $pid without matching ENTER:\n${lines.mkString("\n")}")
        depth -= 1
        assert(depth == 0)
      }
    }
    assert(depth == 0, "witness must end with every ENTER matched")
    assert(!fs.exists(new Path(s"$dir/_writer_lease")), "no leaked lease")
    assert(fs.listStatus(new Path(dir)).forall(st =>
      !st.getPath.getName.endsWith(".crc")),
      "cross-process churn must leave no ChecksumFileSystem sidecar")
  }

  test("kill -9 mid-hold: the dead child's lease is provably dead (same " +
    "host, pid gone) and the next writer reclaims it immediately — a " +
    "crashed holder can wedge the artifact for at most its liveness probe") {
    val dir = tmp("kill9") + "/art"
    fs.mkdirs(new Path(dir))
    val witness = java.nio.file.Files.createTempFile("graft-witness-", ".log")
    val child = fork(Seq(dir, witness.toString, "wedge"))
    // wait until the child is INSIDE the body (witness shows WEDGED)
    val deadline = System.nanoTime() + 120e9.toLong
    while (!witnessLines(witness).exists(_.startsWith("WEDGED")) &&
      System.nanoTime() < deadline) Thread.sleep(50)
    assert(witnessLines(witness).exists(_.startsWith("WEDGED")),
      "child never acquired the lease")
    assert(fs.exists(new Path(s"$dir/_writer_lease")))
    child.destroyForcibly() // SIGKILL: no JVM shutdown hook, no release
    assert(child.waitFor(30, java.util.concurrent.TimeUnit.SECONDS))
    // the lease file survives the kill...
    assert(fs.exists(new Path(s"$dir/_writer_lease")),
      "a kill -9 must leave the lease behind (nothing cleaned it)")
    // ...but its holder pid is provably dead, so reclaim is immediate
    // even with an hour-long staleness window
    var ran = false
    AtomicSwap.withLease(spark, dir, staleMs = 3600000L) { ran = true }
    assert(ran, "the next writer must reclaim a provably-dead holder's " +
      "lease without waiting out staleMs")
    assert(!fs.exists(new Path(s"$dir/_writer_lease")))
  }
}
