package graft

import graft.operators.Multimodal

/** Dev probe (Test scope, not shipped): phase-time the media kernels in
  * isolation — PNG encode (videoBytes = 4 frames/doc), GVID parse, dHash
  * decode, WAV synth + audio hash — over an sf0.1-shaped corpus (5000
  * docs, n_chars-keyed dims), to attribute q_video_dedup /
  * q_audio_dedup cost between synthesis, codec work and Spark overhead.
  * Run: sbt "Test/runMain graft.MediaKernelProbe [nDocs]"
  */
object MediaKernelProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5000
    // n_chars distribution at sf0.1: 44..577, avg 297 → dims via the
    // SHARED mediaTable mapping (Multimodal.mediaDims), so a formula
    // change there can't silently skew what this probe measures
    def dims(d: Long): (Int, Int) =
      Multimodal.mediaDims(44 + ((d * 131) % 534).toInt)
    for (round <- 1 to 3) {
      var t0 = System.nanoTime()
      val clips = Array.tabulate(n) { i =>
        val (w, h) = dims(i)
        Multimodal.videoBytes(i.toLong, w, h, 4)
      }
      val tEnc = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val frames = clips.flatMap(c => Multimodal.parseVideo(c).get)
      val tParse = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      var hsum = 0L
      frames.foreach(f => Multimodal.dhash64(f).foreach(hsum += _))
      val tHash = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val wavs = Array.tabulate(n) { i =>
        val (w, h) = dims(i)
        Multimodal.wavBytes(i.toLong, w * h)
      }
      val tWav = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      var asum = 0L
      wavs.foreach(b => Multimodal.audioHash64(b).foreach(asum += _))
      val tAHash = (System.nanoTime() - t0) / 1e9
      println(f"round $round: pngEncode=$tEnc%.2fs gvidParse=$tParse%.2fs " +
        f"dhash=$tHash%.2fs wavSynth=$tWav%.2fs audioHash=$tAHash%.2fs " +
        s"(chk $hsum/$asum, ${frames.length} frames)")
    }
  }
}
