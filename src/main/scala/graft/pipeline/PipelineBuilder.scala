package graft.pipeline

import graft.contracts._
import graft.sources.{TypedIO, TypedSink, TypedSource}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Phantom typestate for the builder: illegal step orders fail to compile
  * (reference: SparkCore.scala:370-374; typestate tests
  * PipelineBuilderSpec.scala:79-99).
  */
sealed trait BuilderState
sealed trait Empty extends BuilderState
sealed trait WithSource extends BuilderState
sealed trait WithTransform extends BuilderState
sealed trait Complete extends BuilderState

sealed trait PipelineStep {
  def run(spark: SparkSession, in: Option[DataFrame]): DataFrame
}

object PipelineStep {
  final case class Source(step: SparkSession => DataFrame) extends PipelineStep {
    def run(spark: SparkSession, in: Option[DataFrame]): DataFrame = step(spark)
  }
  final case class Transform(step: DataFrame => DataFrame) extends PipelineStep {
    def run(spark: SparkSession, in: Option[DataFrame]): DataFrame =
      step(in.getOrElse(sys.error("No input DataFrame for transform")))
  }
  final case class Sink(step: DataFrame => Unit) extends PipelineStep {
    def run(spark: SparkSession, in: Option[DataFrame]): DataFrame = {
      val df = in.getOrElse(sys.error("No input DataFrame for sink"))
      step(df)
      df
    }
  }
}

/** Contract-enforced pipeline (reference: SparkCore.scala:395-444).
  *
  * Two enforcement layers fuse here:
  *   1. '''Construction-time''' — `addSink[R, P]` runs
  *      `SchemaConforms.require[Cur, R, P]` the moment the builder method is
  *      called (driver-side, before any data is read): a drifting pipeline
  *      throws [[graft.contracts.ContractViolation]] while being *wired*, the
  *      Scala-2 equivalent of the reference's compile abort. Typestate order
  *      violations still fail compilation via the implicit `=:=`/`<:<`
  *      evidence.
  *   2. '''Runtime''' — each step re-pins the actual `DataFrame` schema:
  *      source and mid-pipeline on the default unordered comparator, the sink
  *      on the policy-selected comparator.
  *
  * All contract machinery is O(schema) on the driver; execution stays a lazy
  * Catalyst plan, so user transforms keep full pushdown/pruning/AQE at any
  * scale.
  */
final class PipelineBuilder[S <: BuilderState, CurContract] private (
    val name: String,
    val steps: List[PipelineStep]
) {

  def addSource[C](
      src: TypedSource[C]
  )(implicit sch: ShapeOf[C], ev: S =:= Empty): PipelineBuilder[WithSource, C] = {
    val step = PipelineStep.Source { spark =>
      TypedIO.readDF(src)(spark, sch)
    }
    new PipelineBuilder[WithSource, C](name, steps :+ step)
  }

  /** Attach an already-constructed DataFrame producer as the source (e.g. a
    * table or an upstream engine output); pinned on the default comparator.
    */
  def addSourceDF[C](
      make: SparkSession => DataFrame
  )(implicit sch: ShapeOf[C], ev: S =:= Empty): PipelineBuilder[WithSource, C] = {
    val step = PipelineStep.Source { spark =>
      val df = make(spark)
      SchemaCheck.assertMatchesContract[C](df)
      df
    }
    new PipelineBuilder[WithSource, C](name, steps :+ step)
  }

  def transformAs[Next](desc: String = "")(
      f: DataFrame => DataFrame
  )(implicit ev: S <:< WithSource, sch: ShapeOf[Next]): PipelineBuilder[WithTransform, Next] = {
    val step = PipelineStep.Transform { df =>
      val out = f(df)
      // Mid-pipeline pins stay on the default unordered comparator;
      // policy-aware enforcement happens at the sink boundary.
      SchemaCheck.assertMatchesContract[Next](out)
      out
    }
    new PipelineBuilder[WithTransform, Next](name, steps :+ step)
  }

  def noTransform(implicit ev: S <:< WithSource): PipelineBuilder[WithTransform, CurContract] =
    new PipelineBuilder[WithTransform, CurContract](name, steps :+ PipelineStep.Transform(identity))

  /** The fuse: demands conformance evidence `Cur ⊑ R` under `P` NOW (throws
    * [[ContractViolation]] on drift), and installs the policy-aware runtime
    * pin + write for execution time.
    */
  def addSink[R, P <: SchemaPolicy with Singleton](sink: TypedSink[R])(implicit
      ev0: S <:< WithTransform,
      cur: ShapeOf[CurContract],
      sch: ShapeOf[R],
      p: ValueOf[P]
  ): PipelineBuilder[Complete, CurContract] = {
    SchemaConforms.require[CurContract, R, P](cur, sch, p) // construction-time fuse
    val step = PipelineStep.Sink { df =>
      TypedIO.writeDF[R, P](df, sink)(sch, p)
    }
    new PipelineBuilder[Complete, CurContract](name, steps :+ step)
  }

  def build(implicit ev: S =:= Complete): SparkSession => DataFrame =
    (spark: SparkSession) =>
      steps
        .foldLeft(Option.empty[DataFrame]) { (acc, step) =>
          Some(step.run(spark, acc))
        }
        .get
}

object PipelineBuilder {
  def apply[CurContract](name: String): PipelineBuilder[Empty, CurContract] =
    new PipelineBuilder[Empty, CurContract](name, Nil)
}
