package graft.pipeline

import java.io.File

import org.apache.spark.ml.{Estimator, Model, Transformer}
import org.apache.spark.ml.util.MLWritable

import graft.cv.{PanelSplit, PeriodFold}

/** Versioned directory persistence for [[SequentialCVPipeline]] — the Spark
  * analog of the reference's pickling protocol (`pipeline.py:1145-1244`),
  * but durable across library versions: each spark.ml stage is saved with
  * its OWN `MLWritable` format (the same files `model.write.save` would
  * produce) and reloaded via its class's `load` entry point; fold specs are
  * plain JSON with tagged period values. Java serialization remains only as
  * a per-stage fallback for stages that implement neither.
  *
  * Layout:
  * {{{
  * path/
  *   manifest.json                — version, returnGroup, step + cv + fitted specs
  *   step<i>/estimator/{ml|stage.ser}
  *   step<i>/model/{ml|stage.ser}        (fitted, no-CV step)
  *   step<i>/fold<j>/{ml|stage.ser}      (fitted, CV step)
  * }}}
  */
object PipelinePersistence {
  import org.json4s._
  import org.json4s.jackson.JsonMethods._
  import org.json4s.JsonDSL._

  val FORMAT_VERSION = 1

  // ---- period value encoding (fold specs carry Any) ----------------------

  private def encodeValue(v: Any): JObject = v match {
    case null                   => ("t" -> "null") ~ ("v" -> JNull)
    case x: Int                 => ("t" -> "int") ~ ("v" -> x)
    case x: Long                => ("t" -> "long") ~ ("v" -> x)
    case x: Double              => ("t" -> "double") ~ ("v" -> x)
    case x: String              => ("t" -> "string") ~ ("v" -> x)
    case x: java.sql.Date       => ("t" -> "date") ~ ("v" -> x.toString)
    case x: java.sql.Timestamp  => ("t" -> "ts") ~ ("v" -> (x.getTime * 1000L + x.getNanos / 1000 % 1000))
    case x: java.time.LocalDate => ("t" -> "localdate") ~ ("v" -> x.toString)
    case other => throw new IllegalArgumentException(
      s"Unsupported period value type for persistence: ${other.getClass}")
  }

  private def decodeValue(j: JValue)(implicit fmt: Formats): Any = (j \ "t").extract[String] match {
    case "null"      => null
    case "int"       => (j \ "v").extract[Int]
    case "long"      => (j \ "v").extract[Long]
    case "double"    => (j \ "v").extract[Double]
    case "string"    => (j \ "v").extract[String]
    case "date"      => java.sql.Date.valueOf((j \ "v").extract[String])
    case "ts"        => { val us = (j \ "v").extract[Long]
                          val t = new java.sql.Timestamp(us / 1000L)
                          t.setNanos((us % 1000000L).toInt * 1000); t }
    case "localdate" => java.time.LocalDate.parse((j \ "v").extract[String])
    case t => throw new IllegalArgumentException(s"Unknown period value tag '$t'")
  }

  private def encodeCv(ps: PanelSplit): JObject =
    ("periodsCol" -> ps.periodsCol) ~
      ("snapshotCol" -> ps.snapshotCol.map(JString(_)).getOrElse(JNothing: JValue)) ~
      ("folds" -> ps.folds.map { f =>
        ("index" -> f.index) ~
          ("train" -> f.trainPeriods.map(encodeValue)) ~
          ("test" -> f.testPeriods.map(encodeValue)) ~
          ("snapshot" -> f.snapshot.map(encodeValue).getOrElse(JNothing: JValue))
      })

  private def decodeCv(j: JValue)(implicit fmt: Formats): PanelSplit = {
    val folds = (j \ "folds").extract[List[JValue]].map { fj =>
      PeriodFold(
        (fj \ "index").extract[Int],
        (fj \ "train").extract[List[JValue]].map(decodeValue).toVector,
        (fj \ "test").extract[List[JValue]].map(decodeValue).toVector,
        (fj \ "snapshot").toOption.map(decodeValue))
    }.toVector
    PanelSplit.fromFolds(folds, (j \ "periodsCol").extract[String],
      (j \ "snapshotCol").toOption.map(_.extract[String]))
  }

  // ---- stage save/load (MLWritable preferred, java-ser fallback) ---------

  private def saveStage(stage: AnyRef, dir: File): (String, String) = stage match {
    case w: MLWritable =>
      w.write.overwrite().save(new File(dir, "ml").toString)
      ("ml", stage.getClass.getName)
    case s: Serializable =>
      dir.mkdirs()
      val oos = new java.io.ObjectOutputStream(
        new java.io.FileOutputStream(new File(dir, "stage.ser")))
      try oos.writeObject(s) finally oos.close()
      ("javaser", stage.getClass.getName)
    case other => throw new IllegalArgumentException(
      s"Stage ${other.getClass} is neither MLWritable nor Serializable")
  }

  private def loadStage(kind: String, cls: String, dir: File): AnyRef = kind match {
    case "ml" =>
      // MLReadable companions expose a static `load(path)` forwarder —
      // the same dispatch spark.ml's own Pipeline reader uses
      Class.forName(cls).getMethod("load", classOf[String])
        .invoke(null, new File(dir, "ml").toString)
    case "javaser" =>
      val ois = new java.io.ObjectInputStream(
        new java.io.FileInputStream(new File(dir, "stage.ser")))
      try ois.readObject().asInstanceOf[AnyRef] finally ois.close()
    case k => throw new IllegalArgumentException(s"Unknown stage kind '$k'")
  }

  // ---- whole pipeline ----------------------------------------------------

  def save(pipe: SequentialCVPipeline, path: String): Unit = {
    val root = new File(path)
    root.mkdirs()
    val fittedOpt: Option[Seq[(String, Option[FittedStep])]] =
      if (pipe.isFitted) Some(pipe.fittedSteps) else None

    val stepJsons = pipe.steps.zip(pipe.cvSteps).zipWithIndex.map {
      case (((name, est), cvOpt), i) =>
        val stepDir = new File(root, s"step$i")
        val estJson: JValue =
          if (est == null) JNothing
          else {
            val (kind, cls) = saveStage(est, new File(stepDir, "estimator"))
            ("kind" -> kind) ~ ("class" -> cls): JObject
          }
        val fittedJson: JValue = fittedOpt.map(_(i)._2) match {
          case Some(Some(FittedWhole(m))) =>
            val (kind, cls) = saveStage(m, new File(stepDir, "model"))
            ("type" -> "whole") ~ ("kind" -> kind) ~ ("class" -> cls): JObject
          case Some(Some(FittedPerFold(cv, models))) =>
            val modelJsons = models.map { case (f, m) =>
              val (kind, cls) = saveStage(m, new File(stepDir, s"fold${f.index}"))
              ("foldIndex" -> f.index) ~ ("kind" -> kind) ~ ("class" -> cls): JObject
            }
            ("type" -> "perFold") ~ ("cv" -> encodeCv(cv)) ~ ("models" -> modelJsons): JObject
          case _ => JNothing
        }
        ("name" -> name) ~
          ("passthrough" -> (est == null)) ~
          ("estimator" -> estJson) ~
          ("cv" -> cvOpt.map(encodeCv).getOrElse(JNothing: JValue)) ~
          ("fitted" -> fittedJson): JObject
    }
    val manifest: JObject =
      ("version" -> FORMAT_VERSION) ~
        ("returnGroup" -> pipe.returnGroup) ~
        ("isFitted" -> pipe.isFitted) ~
        ("steps" -> stepJsons)
    java.nio.file.Files.writeString(
      new File(root, "manifest.json").toPath, pretty(render(manifest)))
  }

  def load(path: String): SequentialCVPipeline = {
    implicit val fmt: Formats = DefaultFormats
    val root = new File(path)
    val manifest = parse(java.nio.file.Files.readString(
      new File(root, "manifest.json").toPath))
    val version = (manifest \ "version").extract[Int]
    require(version == FORMAT_VERSION, s"unsupported pipeline format version $version")
    val returnGroup = (manifest \ "returnGroup").extract[String]
    val isFitted = (manifest \ "isFitted").extract[Boolean]
    val stepJsons = (manifest \ "steps").extract[List[JValue]]

    val built = stepJsons.zipWithIndex.map { case (sj, i) =>
      val stepDir = new File(root, s"step$i")
      val name = (sj \ "name").extract[String]
      val passthrough = (sj \ "passthrough").extract[Boolean]
      val est: Estimator[_ <: Model[_]] =
        if (passthrough) null
        else loadStage((sj \ "estimator" \ "kind").extract[String],
          (sj \ "estimator" \ "class").extract[String], new File(stepDir, "estimator"))
          .asInstanceOf[Estimator[_ <: Model[_]]]
      val cv = (sj \ "cv").toOption.map(decodeCv)
      val fitted: Option[FittedStep] = (sj \ "fitted").toOption.flatMap { fj =>
        (fj \ "type").extractOpt[String].map {
          case "whole" =>
            FittedWhole(loadStage((fj \ "kind").extract[String],
              (fj \ "class").extract[String], new File(stepDir, "model"))
              .asInstanceOf[Transformer])
          case "perFold" =>
            val cvF = decodeCv(fj \ "cv")
            val models = (fj \ "models").extract[List[JValue]].map { mj =>
              val idx = (mj \ "foldIndex").extract[Int]
              val m = loadStage((mj \ "kind").extract[String],
                (mj \ "class").extract[String], new File(stepDir, s"fold$idx"))
                .asInstanceOf[Transformer]
              cvF.folds.find(_.index == idx).getOrElse(
                throw new IllegalStateException(s"fold $idx missing from cv spec")) -> m
            }
            FittedPerFold(cvF, models)
          case t => throw new IllegalArgumentException(s"Unknown fitted type '$t'")
        }
      }
      (name, est, cv, fitted)
    }

    val pipe = new SequentialCVPipeline(
      built.map(b => (b._1, b._2)), built.map(_._3), returnGroup)
    if (isFitted)
      pipe.restoreFitted(built.map(b => (b._1, b._4)))
    pipe
  }
}
