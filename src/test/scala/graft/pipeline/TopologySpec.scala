package graft.pipeline

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Generative topology conformance — the port of the reference's
  * topology_tester (testing/correctness/apps/topology_tester/
  * components.py + conformance/tests/topology.py): enumerate chains of
  * the basis steps
  *   {stateless-tag, key_by→state-tag, collect→state-tag}
  * to depth 3, run every chain through the DSL's BATCH path (which
  * chains stateful stages natively), and compare the full tagged output
  * against a sequential in-memory model.
  *
  * Carried invariants from the reference:
  *  - Tag appends its identifier (components.py Tag);
  *  - TagState keeps the two-slot (a, b) state, shifting on every
  *    update, and tags each message with a SNAPSHOT of the state
  *    (components.py State.update/clone — order-sensitive, so this
  *    checks per-key event-order replay, not just multiset equality of
  *    values);
  *  - keyed state never sees two keys (PartitionedState's key-compat
  *    assert) — enforced with a require inside the wrapper, so a
  *    routing bug fails the run itself, not just the compare.
  *
  * The reference generates PRE×COMPS to depth 3 (84 chains per worker
  * count); here the un-keyed `state` base maps to `collectAll` (the DSL
  * requires explicit routing before state — the reference's implicit
  * single default key), and all depth-1/2 chains plus a seeded sample
  * of depth-3 chains run (full depth-3 at Spark-job granularity would
  * be ~40 s of suite time for no added coverage class).
  */
object TopologyFixtures {
  // (value, key, tags) — states are rendered into the tag string, like
  // the reference renders clone() tuples into Message.states.
  type Msg = (Long, String, String)

  final class TwoSlot extends Serializable {
    var a: String = ""
    var b: String = ""
    def update(key: String, value: Long, partitioned: Boolean): String = {
      // PartitionedState._partitioned assert: keyed state never mixes keys
      if (partitioned) require(b.isEmpty || b.startsWith(s"$key="),
        s"keyed state for '$key' saw foreign entry '$b'")
      a = b
      b = s"$key=$value"
      s"($a|$b)"
    }
  }

  final class TagComp(id: Int) extends StatelessComputation[Msg, Msg] {
    override val name = s"tag$id"
    def apply(m: Msg): ComputationResult[Msg] =
      ComputationResult.One((m._1, m._2, m._3 + s";tag__$id"))
  }

  final class TagStateComp(id: Int, partitioned: Boolean)
      extends StateComputation[Msg, Msg, TwoSlot] {
    override val name = s"tagstate$id"
    def initialState(): TwoSlot = new TwoSlot
    def apply(m: Msg, st: TwoSlot): ComputationResult[Msg] = {
      val snap = st.update(m._2, m._1, partitioned)
      ComputationResult.One((m._1, m._2, m._3 + s";tagstate__$id$snap"))
    }
  }

  sealed trait Step
  case object Stateless extends Step
  case object KeyedState extends Step   // key_by(msg.key) → state
  case object CollectedState extends Step // collect → state (single key)

  val Basis: Seq[Step] = Seq(Stateless, KeyedState, CollectedState)
}

class TopologySpec extends AnyFunSuite {
  import TopologyFixtures._
  private lazy val spark = TestSpark.spark
  private implicit def ss: SparkSession = spark
  private implicit val msgEnc: Encoder[Msg] =
    Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.STRING)

  // 24 messages over 4 keys, event time = arrival index (unique, so the
  // batch replay's per-key order IS arrival order, like the reference's
  // single TCP sender).
  private val input: Seq[Msg] =
    (0L until 24L).map(i => (i, s"k${i % 4}", ""))

  /** The in-memory model: fold messages in arrival order through the
    * chain, with per-(stage, scope-key) two-slot states. */
  private def model(chain: Seq[Step]): Seq[String] = {
    val states = scala.collection.mutable.Map.empty[(Int, String), TwoSlot]
    input.map { m0 =>
      var m = m0
      chain.zipWithIndex.foreach { case (step, idx) =>
        m = step match {
          case Stateless => (m._1, m._2, m._3 + s";tag__$idx")
          case KeyedState =>
            val st = states.getOrElseUpdate((idx, m._2), new TwoSlot)
            (m._1, m._2, m._3 + s";tagstate__$idx${st.update(m._2, m._1, partitioned = true)}")
          case CollectedState =>
            val st = states.getOrElseUpdate((idx, "*"), new TwoSlot)
            (m._1, m._2, m._3 + s";tagstate__$idx${st.update(m._2, m._1, partitioned = false)}")
        }
      }
      s"${m._1}|${m._2}|${m._3}"
    }.sorted
  }

  private def runChain(chain: Seq[Step]): Seq[String] = {
    val src = spark.createDataset(input)(msgEnc)
    var p = Graft.source("topo", DatasetSource(src, (m: Msg) => m._1))
    chain.zipWithIndex.foreach { case (step, idx) =>
      p = step match {
        case Stateless      => p.to(new TagComp(idx))
        case KeyedState     => p.keyBy(_._2).to(new TagStateComp(idx, partitioned = true))
        case CollectedState => p.collectAll().to(new TagStateComp(idx, partitioned = false))
      }
    }
    p.dataset.collect().map { case (m, _) => s"${m._1}|${m._2}|${m._3}" }.toSeq.sorted
  }

  private def chains: Seq[Seq[Step]] = {
    val d1 = Basis.map(Seq(_))
    val d2 = for (a <- Basis; b <- Basis) yield Seq(a, b)
    // seeded sample of depth-3 (full 27 would be ~30 s of Spark jobs)
    val rand = new scala.util.Random(42)
    val d3 = Seq.fill(6)(Seq.fill(3)(Basis(rand.nextInt(Basis.size))))
    d1 ++ d2 ++ d3
  }

  test("generative topology chains match the sequential model") {
    chains.foreach { chain =>
      val got = runChain(chain)
      val want = model(chain)
      assert(got == want, s"chain ${chain.mkString("→")} diverged")
    }
  }
}
