package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ml.MlPipelines
import graft.operators.{FeaturePipeline, Multimodal}
import graft.streaming.StreamingAggregates

class MlPipelinesSpec extends SparkSpec {
  import spark.implicits._

  lazy val bars = StockFixture.bars(spark, nDays = 6, minutesPerDay = 40).cache()

  test("feature list cardinalities match the reference configs") {
    assert(MlPipelines.FeatureLists.rfRaw.size == 59) // 58 doubles + volume
    assert(MlPipelines.FeatureLists.svm.size == 57)
    assert(MlPipelines.FeatureLists.postFe.size == 36)
  }

  test("RF pipeline (mllib-parity params) trains and evaluates") {
    val data = FeaturePipeline.fast(bars)
    val (_, preds) = MlPipelines.fitPredict(
      data, MlPipelines.FeatureLists.postFe, MlPipelines.rfMllibParity())
    val metrics = MlPipelines.evaluate(preds)
    assert(metrics("areaUnderROC") >= 0.0 && metrics("areaUnderROC") <= 1.0)
    assert(metrics.contains("accuracy") && metrics.contains("f1"))
    val cm = MlPipelines.confusionMatrix(preds).collect()
    assert(cm.map(_.getLong(2)).sum == preds.count())
  }

  test("M12: mllib metrics twin agrees with the DataFrame evaluators") {
    import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
    val data = FeaturePipeline.fast(bars)
    val (_, preds) = MlPipelines.fitPredict(
      data, MlPipelines.FeatureLists.postFe, MlPipelines.rfMllibParity())
    val df = MlPipelines.evaluate(preds)
    val rdd = MlPipelines.evaluateMllib(preds)
    assert(math.abs(df("accuracy") - rdd("accuracy")) < 1e-12)
    assert(math.abs(df("f1") - rdd("f1")) < 1e-12)
    // the mllib twin scores HARD predictions (the reference's RDD path);
    // compare against the evaluator fed the same hard column, not the
    // default rawPrediction scores
    val hardAuc = new BinaryClassificationEvaluator()
      .setLabelCol("buy_or_sell").setRawPredictionCol("prediction")
      .setMetricName("areaUnderROC").evaluate(preds)
    assert(math.abs(hardAuc - rdd("areaUnderROC_hard")) < 1e-12)
  }

  test("GBT (the reference's other dead import) trains and evaluates") {
    val data = graft.operators.Labeler.label(bars)
    val (_, preds) = MlPipelines.fitPredict(
      data, Seq("close", "high", "low", "open", "volume"),
      MlPipelines.gbt())
    val m = MlPipelines.evaluate(preds)
    assert(m("accuracy") >= 0.0 && m("accuracy") <= 1.0)
    assert(preds.columns.contains("prediction"))
  }

  test("M13: CrossValidator over the RF grid picks a best model") {
    val data = graft.operators.Labeler.label(bars)
    val cv = MlPipelines.crossValidate(
      data, Seq("close", "high", "low", "open", "volume"), numFolds = 2)
    assert(cv.avgMetrics.length == 4, "2x2 grid -> 4 avg metrics")
    assert(cv.avgMetrics.forall(m => m >= 0.0 && m <= 1.0))
    val preds = cv.bestModel.transform(data)
    assert(preds.columns.contains("prediction"))
    // best grid point's metric is the max of the averaged fold metrics
    val best = cv.avgMetrics.max
    assert(cv.avgMetrics.contains(best))
  }

  test("LinearSVC trains with the reference hyperparameters") {
    val data = graft.operators.Labeler.label(bars)
    val (_, preds) = MlPipelines.fitPredict(
      data, Seq("close", "low", "open", "volume"), MlPipelines.svm())
    assert(preds.columns.contains("prediction"))
    assert(preds.select("prediction").distinct().count() <= 2)
  }

  test("scaled PCA explains variance monotonically") {
    val data = graft.operators.Labeler.label(bars)
    val cols = Seq("close", "high", "low", "open", "sma5", "sma10")
    val (out, model) = MlPipelines.scaledPca(data, cols, k = 3, prefix = "all")
    val ev = model.explainedVariance.toArray
    assert(ev.length == 3)
    assert(ev.sorted.reverse.sameElements(ev), "variance not sorted desc")
    assert(ev.sum <= 1.000001)
    assert(out.columns.contains("pca_all_features"))
  }

  test("correlation matrix is symmetric with unit diagonal") {
    val data = bars.select("close", "high", "low")
    val corr = MlPipelines.correlationMatrix(data, Seq("close", "high", "low"))
      .toArray.grouped(3).toArray
    (0 until 3).foreach { i =>
      assert(math.abs(corr(i)(i) - 1.0) < 1e-9)
      (0 until 3).foreach(j =>
        assert(math.abs(corr(i)(j) - corr(j)(i)) < 1e-9))
    }
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.fromText(
    spark.read.parquet(sf("documents"))).cache()

  test("media table has the typed metadata schema") {
    assert(media.schema.fieldNames.toSeq ==
      Multimodal.mediaSchema.fieldNames.toSeq)
    val kinds = media.select($"kind").distinct().collect()
      .map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    // metadata respects kind: only images have dims, only audio has rate
    assert(media.filter($"kind" =!= "image" && $"meta_width".isNotNull)
      .count() == 0)
    assert(media.filter($"kind" =!= "audio" && $"meta_sample_rate".isNotNull)
      .count() == 0)
  }

  test("feature extraction: fixed dim, deterministic, payload dropped") {
    // forced FakeCodec: this test covers the PLUMBING (schema, batch
    // shape, determinism); real decode is MultimodalCodecSpec's job
    val feats = Multimodal.extractFeatures(media, Some(Multimodal.FakeCodec))
    assert(!feats.columns.contains("payload"))
    val rows = feats.select($"media_id", $"features").collect()
    assert(rows.length == media.count())
    rows.foreach { r =>
      val f = r.getSeq[Float](1)
      assert(f.length == Multimodal.FakeCodec.featureDim)
      // histogram part sums to ~1
      assert(math.abs(f.take(16).sum - 1.0f) < 1e-3)
    }
    // deterministic: run twice, same values
    val again = Multimodal.extractFeatures(media, Some(Multimodal.FakeCodec))
      .select($"media_id", $"features").collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("byte-sized repartition yields >= 1 partitions and keeps rows") {
    val rep = Multimodal.repartitionByBytes(media, targetMb = 1)
    assert(rep.count() == media.count())
  }

  test("frame sampling emits frame rows only for video") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2)
    assert(frames.count() >= media.filter($"kind" === "video").count())
    assert(frames.select($"kind").distinct().collect()
      .map(_.getString(0)).toSet == Set("video"))
    val f = frames.select($"frame").head().getAs[Array[Byte]](0)
    assert(f.length <= 16 && f.length > 0)
  }
}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked daily aggregate over a file stream matches batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val batch = graft.queries.Oracle.events(spark, "/root/testdata/sf0.001")
      .select($"ts".cast("timestamp").as("ts"), $"value")
    batch.write.mode("overwrite").parquet(dir)
    val stream = StreamingAggregates.readStream(
      spark, batch.schema, dir)
    val agg = StreamingAggregates.dailyAggregate(stream, "ts", "value")
    val q = StreamingAggregates.runToMemory(agg, "daily_out", OutputMode.Append)
    q.processAllAvailable(); q.stop()
    val got = spark.table("daily_out")
      .select($"day_start", $"n", $"avg_value")
    val want = batch.groupBy(window($"ts", "1 day")).agg(
      count(lit(1)).as("n"), avg($"value").as("avg_value"))
      .select($"window.start".as("day_start"), $"n", $"avg_value")
    // append-mode emits only watermark-closed windows; every emitted row
    // must match its batch twin, and most days should have been emitted
    val wantMap = want.collect().map(r => r.getTimestamp(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val gotRows = got.collect()
    assert(gotRows.length >= wantMap.size - 1, s"${gotRows.length} of ${wantMap.size}")
    gotRows.foreach { r =>
      val (n, avgV) = wantMap(r.getTimestamp(0))
      assert(r.getLong(1) == n && math.abs(r.getDouble(2) - avgV) < 1e-9)
    }
  }

  test("foreachBatch daily sink: batch logic per micro-batch, idempotent overwrite") {
    val src = java.nio.file.Files.createTempDirectory("graft-fb-src").toString
    val out = java.nio.file.Files.createTempDirectory("graft-fb-out").toString
    val ckp = java.nio.file.Files.createTempDirectory("graft-fb-ckp").toString
    val batch = graft.queries.Oracle.events(spark, "/root/testdata/sf0.001")
      .select($"ts".cast("timestamp").as("ts"), $"value")
    batch.write.mode("overwrite").parquet(src)
    val stream = StreamingAggregates.readStream(spark, batch.schema, src)
    val q = StreamingAggregates.foreachBatchDaily(
      stream, "ts", "value", out, ckp)
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(out)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Double]("sum_value"), r.getAs[Long]("n")))).toMap
    val want = batch
      .groupBy($"ts".cast("date").as("day"))
      .agg(sum($"value".cast(org.apache.spark.sql.types.DecimalType(28, 6)))
        .cast("double").as("sum_value"), count(lit(1)).as("n"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Double]("sum_value"), r.getAs[Long]("n")))).toMap
    // decimal sums are batch-boundary independent: every written day is
    // bit-exact; update mode + dynamic overwrite makes the sink converge
    assert(got.nonEmpty && got.keySet.subsetOf(want.keySet))
    got.foreach { case (d, v) => assert(want(d) == v, s"day $d") }
  }

  test("stateful streaming label matches batch lag semantics per key") {
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-stream2").toString
    val batch = graft.queries.Oracle.events(spark, "/root/testdata/sf0.001")
      .select($"user_id".as("key"), $"ts".cast("timestamp").as("ts"), $"value")
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
      .as[StreamingAggregates.KeyedValue]
    val labeled = StreamingAggregates.statefulLabel(stream)
    val q = labeled.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("labeled_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("labeled_out")
      .select($"key", $"ts", $"buyOrSell").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> r.getInt(2)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"key").orderBy($"ts")
    val want = batch.withColumn("prev", lag($"value", 1).over(w))
      .withColumn("lbl", when($"prev" > $"value", 1).otherwise(0))
      .select($"key", $"ts", $"lbl").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> r.getInt(2)).toMap
    assert(got.size == want.size)
    want.foreach { case (k, v) => assert(got(k) == v, s"key $k") }
  }
}
