package graft.pipeline

import java.nio.ByteBuffer

import org.apache.spark.serializer.KryoSerializer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{BinaryType, StructType}

/** Checkpoint state forensics over Spark's state-store reader
  * (`spark.read.format("statestore")`) — the recovery gate's TRUE
  * double-apply detector (VERDICT r14 next #2).
  *
  * The delivery hash proves received == sent as multisets (the
  * reference's own 1-to-1 passthrough contract,
  * testing/correctness/scripts/effectively-once/1-to-1-passthrough-
  * verify.sh), but a replayed row APPLIED to state twice while emitted
  * once is invisible to it. The final keyed state is where that class
  * lives: for an order-free state machine (sums, counts, maxima) the
  * recovered chain's per-key state must equal the uninterrupted
  * baseline's exactly, REGARDLESS of how Spark re-grouped batches across
  * the restart.
  *
  * Why decode rather than hash the raw state bytes: the stored blob is
  * the kryo-serialized [[KeyState]], which also carries `outputWm` — the
  * query watermark at the key's last update, a value that legitimately
  * moves when a restart re-plans batch composition (the r14 forensics'
  * re-grouping class). Byte equality would therefore flake on correct
  * recoveries; decoding and comparing only the USER state fields is the
  * grouping-insensitive gate.
  */
private[graft] object StateIntrospection {

  /** Read the final committed keyed state of a flatMapGroupsWithState
    * query from its checkpoint: (grouping key, the user state object
    * inside [[StateComputationWrapper]]). The result is collected to the
    * driver, so the live key count bounds driver memory — callers are
    * bench/test rigs with known-small key spaces, and the contract is
    * now ENFORCED (VERDICT r15 next #6): a checkpoint holding more than
    * `maxKeys` live keys fails with a sizing message instead of a
    * silent driver OOM; a caller that genuinely wants a bigger decode
    * raises the bound explicitly. */
  def keyedComputationState(spark: SparkSession, ckpt: String,
      maxKeys: Long = 1L << 20): Seq[(String, Any)] = {
    require(maxKeys > 0 && maxKeys < Int.MaxValue,
      s"maxKeys must be in (0, Int.MaxValue), got $maxKeys — the bound " +
        "caps a driver collect, which is Int-indexed")
    val df = spark.read.format("statestore").load(ckpt)
    // value layout (fMGWS state manager v2): [groupState: struct(<obj
    // serializer schema>), timeoutTimestamp]. With a kryo state encoder
    // the object schema is a single BinaryType column; locate it
    // structurally instead of hard-coding names so a Spark-side rename
    // fails loudly here, not as a silent wrong-column read.
    def binaryLeaf(t: StructType, prefix: String): Option[String] =
      t.fields.iterator.flatMap { f =>
        f.dataType match {
          case BinaryType     => Some(s"$prefix`${f.name}`")
          case s: StructType  => binaryLeaf(s, s"$prefix`${f.name}`.")
          case _              => None
        }
      }.nextOption()
    val valueType = df.schema("value").dataType.asInstanceOf[StructType]
    val blobCol = binaryLeaf(valueType, "value.").getOrElse(throw new IllegalStateException(
      s"no binary state column under 'value' in state schema $valueType — " +
        "is this checkpoint from a kryo-encoded flatMapGroupsWithState query?"))
    val keyType = df.schema("key").dataType.asInstanceOf[StructType]
    require(keyType.fields.length == 1,
      s"expected a single-field grouping key, got $keyType")
    // single pass (ADVICE r16: the previous count()-then-collect() read
    // the checkpoint twice on every call): take one row past the bound —
    // its presence IS the over-bound proof, with no second scan
    val rows = df.selectExpr(s"cast(key.`${keyType.fields.head.name}` as string)",
      blobCol).take(maxKeys.toInt + 1)
    require(rows.length <= maxKeys,
      s"state checkpoint $ckpt holds more than $maxKeys live keys — " +
        "keyedComputationState is a bench/test forensics tool, not a " +
        "production-scale reader; pass a larger maxKeys explicitly if " +
        "the driver can hold the decode, or aggregate over " +
        "spark.read.format(\"statestore\") directly")
    // the exact serializer Encoders.kryo's DecodeUsingSerializer builds
    // (SerializerSupport: KryoSerializer over the SparkEnv conf)
    val ser = new KryoSerializer(spark.sparkContext.getConf).newInstance()
    rows.toSeq.map { r =>
      val ks = ser.deserialize[KeyState[Any, Any]](
        ByteBuffer.wrap(r.getAs[Array[Byte]](1)))(
        scala.reflect.ClassTag(classOf[KeyState[Any, Any]]))
      val st = ks.wrapper match {
        case w: StateComputationWrapper[_, _, _] => w.currentState
        case other => throw new IllegalStateException(
          s"state introspection supports StateComputationWrapper, got ${other.getClass}")
      }
      (r.getString(0), st)
    }
  }
}
