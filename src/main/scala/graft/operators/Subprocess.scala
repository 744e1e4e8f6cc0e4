package graft.operators

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.Dataset

/** Pipe rows through an external binary, one process per partition — the
  * reference's subprocess pattern (`subprocess/ExampleEchoPipeline
  * .scala:20-28`: invoke a compiled Echo binary inside a DoFn), done the
  * Hadoop-streaming way: lines in on stdin, lines out on stdout.
  *
  * This is deliberately `mapPartitions` (the documented last-resort tier
  * for genuinely imperative per-partition logic): process startup
  * amortizes over a whole partition, not a row, and every executor runs
  * its partitions' processes independently — no driver involvement, so
  * the operator scales with the cluster like any other narrow transform.
  *
  * A writer thread feeds stdin while the task thread consumes stdout —
  * both sides stream, so a partition never materializes in memory and
  * pipes can't deadlock on a full OS buffer. A non-zero exit code fails
  * the task (with the process's stderr in the message) rather than
  * silently truncating output; Spark's normal task retry then applies.
  * Contract: the command must be line-oriented; 1:1 in/out order is the
  * command's business, not enforced here (sort-insensitive consumers or
  * 1:1 filters both work).
  */
object Subprocess {

  def pipePartitions(ds: Dataset[String], command: Seq[String]): Dataset[String] = {
    implicit val enc = ds.encoder
    ds.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val pb = new ProcessBuilder(command: _*)
        val proc = pb.start()
        // Tie the process to the TASK, not the iterator: a short-circuit
        // consumer (limit/take) abandons the iterator before EOF, which
        // would otherwise leak a live process + blocked writer thread per
        // partition for the executor's lifetime.
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => proc.destroyForcibly()))
        val stderrBuf = new StringBuilder
        val errDrain = new Thread(() => {
          val r = new BufferedReader(new InputStreamReader(proc.getErrorStream, UTF_8))
          var l = r.readLine()
          while (l != null) {
            if (stderrBuf.length < 4096) stderrBuf.append(l).append('\n')
            l = r.readLine()
          }
        }, "subprocess-stderr")
        errDrain.setDaemon(true)
        errDrain.start()
        // A writer failure (upstream read error, broken pipe) must fail
        // the TASK, not die silently with the daemon thread — otherwise
        // stdin closes early, the command exits 0 on the truncated input
        // and the task "succeeds" with missing rows.
        @volatile var writerFailure: Throwable = null
        val writer = new Thread(() => {
          val w = new BufferedWriter(new OutputStreamWriter(proc.getOutputStream, UTF_8))
          try rows.foreach { l => w.write(l); w.newLine() }
          catch { case t: Throwable => writerFailure = t }
          finally w.close()
        }, "subprocess-stdin")
        writer.setDaemon(true)
        writer.start()
        val out = new BufferedReader(new InputStreamReader(proc.getInputStream, UTF_8))
        new Iterator[String] {
          private var nextLine: String = out.readLine()
          override def hasNext: Boolean = {
            if (nextLine == null) {
              val code = proc.waitFor()
              writer.join(5000)
              errDrain.join(5000)
              if (writerFailure != null)
                throw new RuntimeException(
                  s"subprocess ${command.mkString(" ")}: input-side failure",
                  writerFailure)
              if (code != 0)
                throw new RuntimeException(
                  s"subprocess ${command.mkString(" ")} exited $code: $stderrBuf")
            }
            nextLine != null
          }
          override def next(): String = {
            val l = nextLine; nextLine = out.readLine(); l
          }
        }
      }
    }
  }
}
