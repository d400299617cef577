package graft.codec

/** Immutable codec knobs, threaded EXPLICITLY through every kernel call —
  * never JVM-global state. Two concurrent encode jobs with different confs
  * in one executor JVM must not interact (the determinism contract on
  * [[graft.engine.Segment]] requires a bucket's bytes to be a pure function
  * of data + conf), so these ride the task closure as plain parameters, the
  * same way the reference's per-scan options ride its `OrcReadOptions`
  * value rather than a process global (/root/reference/src/options.rs:49-98).
  *
  * @param zlibLevel      block-compression deflate level 0-9 (6 = ORC's
  *                       default zlib stance: size over speed)
  * @param deflateMinGain sampled-gain threshold below which the block
  *                       compressor skips the full deflate pass (0 = always
  *                       deflate, the best-compression point)
  * @param dictThreshold  distinct/total ratio bound for dictionary encoding
  *                       (ORC `orc.dictionary.key.threshold` default 0.8)
  */
final case class CodecConf(
    zlibLevel: Int = 6,
    deflateMinGain: Double = 0.0,
    dictThreshold: Double = 0.8)

object CodecConf {
  val Default: CodecConf = CodecConf()
}
