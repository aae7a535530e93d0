package graft.tools

import graft.synth.Synth

/** Raw-thread microbenchmark of Synth.genRow (no Spark): does the
  * generator itself scale with threads? */
object GenProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    Seq(1, 8, 32).foreach { threads =>
      // warmup
      (0L until 20000L).foreach(i => Synth.genRow(7L, i))
      val t0 = System.nanoTime()
      val per = n / threads
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => {
          var i = t * per
          val end = (t + 1) * per
          var acc = 0L
          while (i < end) { acc += Synth.genRow(42L, i).article.text.length; i += 1 }
          if (acc == -1) println("impossible")
        })
        th.start(); th
      }
      ts.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"GENPROBE threads=$threads%2d wall=$wall%7.2fs rows/s=${n / wall}%.0f")
    }
  }
}
