package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{GraftConfig, IncidentPipeline}

class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import SparkTest.Sf

  test("config resolves env overrides with reference-style defaults") {
    val cfg = GraftConfig.from {
      case "GRAFT_RAG_TOP_K" => Some("7")
      case "GRAFT_LIMIT" => Some("123")
      case _ => None
    }
    assert(cfg.ragTopK == 7 && cfg.limitCount == 123)
    assert(cfg.levelFilter == "error" && cfg.batchSize == 5)
  }

  test("end-to-end pipeline: fetch → preprocess → embed → index → rag → history") {
    val out = "/tmp/graft_pipeline_test"
    val (historyRows, prompt) = IncidentPipeline.run(spark, Sf, out)
    assert(historyRows > 0)
    assert(prompt.startsWith("Given the following logs"))
    assert(prompt.contains("Current Logs:\n- "))
    assert(prompt.contains("Similar Past Incidents:\n- "))
    assert(prompt.endsWith("RCA and Fix Suggestion:"))
    // index is re-readable and unit-normalized
    val idx = spark.read.parquet(s"$out/index")
    assert(idx.count() > 0)
    val norms = idx.select(graft.functions.VecFns.norm(col("embedding")).as("n"))
      .where(abs(col("n") - 1.0) > 1e-9 && col("n") =!= 0.0)
    assert(norms.count() == 0, "index embeddings must be unit-norm")
    // history carries similarity context
    val hist = spark.read.parquet(s"$out/history")
    assert(hist.columns.contains("best_sim") && hist.columns.contains("n_hits"))
  }

  test("pipeline stages are individually lazy plans (no action before sink)") {
    val cfg = GraftConfig(limitCount = 50)
    val fetched = IncidentPipeline.fetch(spark, Sf, cfg)
    val cleaned = IncidentPipeline.preprocess(fetched)
    val embedded = IncidentPipeline.embed(cleaned, cfg)
    // still unexecuted plans; a single action drives the whole chain
    assert(embedded.queryExecution.logical != null)
    assert(embedded.count() <= 50)
  }
}
