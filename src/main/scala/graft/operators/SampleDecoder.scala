package graft.operators

/** Pluggable SAMPLE-decode SPI — the formal seam at the engine's
  * documented codec-stub boundary.
  *
  * The container layer ([[VideoContainer]]/[[MkvContainer]]/
  * [[AudioContainer]]) extracts header-exact stream facts and EXACT
  * keyframe byte ranges for every modern codec family; what the JDK
  * cannot do is rasterize AVC/HEVC/VP9/AV1 samples or synthesize PCM
  * from MP3/AAC/Opus. These traits are where a deployment plugs those
  * decoders in WITHOUT editing the engine: the certified slicing plan
  * ([[Multimodal.decodeKeyframes]]) resolves a [[FrameDecoder]] per
  * container codec id at its decode step, and the PCM feature plan
  * ([[Multimodal.decodeAudioFeatures]]) walks a [[PcmDecoder]] chain.
  * Codecs no provider claims keep today's quarantine behavior (blob
  * excluded / NULL features) — the stub shrinks to exactly the codecs
  * a deployment has not plugged.
  *
  * Decoders are plain serializable VALUES passed to the decode
  * operators and captured in the UDF closure — they ship to executors
  * with the plan itself, so there is no global registry to keep
  * consistent across driver and executor JVMs (the failure mode of
  * static registration under a real cluster).
  */
object SampleDecoder {

  /** Rasterizes ONE video sample payload of a codec it claims.
    * `codecs` are container codec ids exactly as the container layer
    * reports them (ISO/QuickTime sample-entry fourccs, Matroska
    * `V_*` ids). `decode` must return None on undecodable payloads —
    * never throw on dirty bytes (one corrupt frame quarantines, it
    * must not abort the job).
    */
  trait FrameDecoder extends Serializable {
    def codecs: Set[String]
    def decode(codec: String,
        payload: Array[Byte]): Option[java.awt.image.BufferedImage]
  }

  /** Decodes ONE audio payload (a whole file or a sliced sample run)
    * to a PCM stream. Audio payloads carry their own framing, so
    * resolution is by `claims` (a cheap pre-filter) rather than a
    * container-supplied codec id — and the chain FALLS THROUGH: each
    * claiming provider gets a try until one returns Some, so a broad
    * claim that fails to decode does not shadow a later provider.
    * `decode` returns a stream of 16-bit signed little-endian PCM at
    * the source rate (the one sample layout feature extraction reads)
    * or None.
    */
  trait PcmDecoder extends Serializable {
    def claims(payload: Array[Byte]): Boolean
    def decode(
        payload: Array[Byte]): Option[javax.sound.sampled.AudioInputStream]
  }

  /** The JDK's built-in frame provider: every Motion-JPEG-family
    * sample IS a standalone baseline JPEG (`jpeg` is the 14496-12/
    * QuickTime sample-entry fourcc, `mjpa`/`mjpb` the QuickTime
    * field-coded variants, `MJPG`/`mjpg`/`AVDJ`/`dmb1` the RIFF-world
    * spellings, `V_MJPEG` the Matroska id), so `javax.imageio`
    * rasterizes it with no codec library.
    */
  object ImageIoFrames extends FrameDecoder {
    val codecs: Set[String] =
      Set("jpeg", "mjpa", "mjpb", "MJPG", "mjpg", "AVDJ", "dmb1", "V_MJPEG")
    def decode(codec: String, payload: Array[Byte])
        : Option[java.awt.image.BufferedImage] =
      Option(Multimodal.decodeImage(payload))
  }

  /** The JDK's built-in PCM provider via `javax.sound.sampled`,
    * normalized to 16-bit signed little-endian PCM at the source
    * rate. It claims every non-trivial payload and lets AudioSystem
    * sniff — deliberately NOT a magic-byte allowlist: AudioSystem
    * consults every `AudioFileReader` SPI on the classpath, so a
    * deployment that adds formats the standard javax.sound way (an
    * mp3spi-style jar) keeps working with no engine change; the
    * decode chain falls through on None, so this broad claim shadows
    * nothing.
    */
  object JavaSoundPcm extends PcmDecoder {
    def claims(payload: Array[Byte]): Boolean =
      payload != null && payload.length >= 4
    def decode(payload: Array[Byte])
        : Option[javax.sound.sampled.AudioInputStream] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val f = in.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
          f.getSampleRate, false)
        Some(javax.sound.sampled.AudioSystem.getAudioInputStream(target, in))
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Default provider sets — the families decodable with zero codec
    * libraries: ImageIO rasters, javax.sound PCM containers, and the
    * engine's own spec-implemented FLAC decoder ([[Flac.FlacPcm]] —
    * RFC 9639 in pure JVM code, the proof the SPI seam carries a real
    * compressed codec). A deployment prepends its codec-library
    * providers; first claim wins, so external providers can also
    * OVERRIDE a built-in. FLAC sits before the JavaSound sniff chain:
    * its claim is an exact magic, and JDKs ship no FLAC reader.
    */
  def frameDefaults: Seq[FrameDecoder] = Seq(ImageIoFrames)
  def pcmDefaults: Seq[PcmDecoder] =
    Seq(Flac.FlacPcm, Adpcm.AdpcmPcm, JavaSoundPcm)

  /** THE one definition of PCM chain resolution (fall-through: every
    * claiming provider gets a try until one returns Some). All PCM
    * consumers ([[Multimodal]] features, [[AudioPhash]] hashes, gate
    * kernels) resolve through here so the chain semantics cannot
    * drift between call sites.
    */
  def decodePcm(payload: Array[Byte],
      decoders: Seq[PcmDecoder] = pcmDefaults)
      : Option[javax.sound.sampled.AudioInputStream] =
    if (payload == null) None
    else decoders.iterator.filter(_.claims(payload))
      .flatMap(_.decode(payload)).nextOption()
}
