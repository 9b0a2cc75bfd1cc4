package graft

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Executes the iterative-operator family on a MULTI-JVM master (VERDICT
  * r10 next-round #1): [[LocalClusterSmoke]] runs DedupClusters / KCore /
  * mstOf under `local-cluster[2,2,1024]` with a reliable checkpointDir in
  * a child JVM (one SparkContext per JVM — the shared local[4] test
  * session cannot host a second master). Exit 0 + the OK marker means the
  * reliable-checkpoint path works where localCheckpoint genuinely
  * wouldn't be durable: executors that are separate OS processes.
  */
class LocalClusterSpec extends AnyFunSuite {

  test("DedupClusters/KCore/mstOf run under local-cluster with reliable checkpoints") {
    assume(new java.io.File(sys.env.getOrElse("SPARK_HOME", "/nonexistent"))
      .isDirectory, "SPARK_HOME distribution not present")
    val javaBin = sys.props("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
      "-cp", sys.props("java.class.path"), "graft.LocalClusterSmoke")
    val out = new StringBuilder
    val logger = ProcessLogger(l => out.synchronized { out ++= l += '\n' })
    // The in-process Worker builds executor commands via the launcher's
    // AbstractCommandBuilder, which requires SPARK_SCALA_VERSION when not
    // launched through bin/spark-class (load-spark-env.sh normally sets it).
    val exit = Process(cmd, None, "SPARK_SCALA_VERSION" -> "2.13")
      .run(logger).exitValue()
    val text = out.synchronized(out.toString)
    assert(exit == 0, s"child exited $exit:\n${text.takeRight(4000)}")
    assert(text.contains("LC-SMOKE OK"), text.takeRight(4000))
  }
}
