"""Evaluation metrics as DataFrame aggregates.

Replaces the reference's driver-side counter loops with distributed
joins + aggregations (semantics citations):

- POS accuracy: phonlp/models/pos/scorer.py:26-39 (correct/total);
- NER entity-level micro P/R/F1: phonlp/models/ner/scorer.py:13-65
  (exact-span+type match between guessed and gold entity sets);
- token-level per-tag P/R/F1: ner/scorer.py:83-115;
- UAS/LAS: phonlp/models/depparse/scorer.py:12-24 +
  utils/conll18_ud_eval.py:526-543 (identity-aligned tokens here, so
  plain equi-joins — no LCS alignment needed).

Inputs are long annotation tables keyed by (doc_id, sent_id, token_id)
or entity tables keyed by (doc_id, sent_id, start, end, type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_KEY = ["doc_id", "sent_id", "token_id"]
ENTITY_KEY = ["doc_id", "sent_id", "start", "end", "type"]


def pos_accuracy(pred: DataFrame, gold: DataFrame, col: str = "upos") -> DataFrame:
    """One row: (n_tokens, n_correct, accuracy_permille).

    Permille is integer division (DIV), never a double divide: at exact
    boundaries Spark's floor(double) and other engines' can disagree in
    the last ulp, so all ratio metrics here stay in integer arithmetic.
    """
    j = pred.select(*TOKEN_KEY, F.col(col).alias("p")).join(
        gold.select(*TOKEN_KEY, F.col(col).alias("g")), TOKEN_KEY)
    agg = j.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum((F.col("p") == F.col("g")).cast("long")).alias("n_correct"),
    )
    return agg.select(
        "n_tokens", "n_correct",
        F.expr("CAST((n_correct * 1000) DIV greatest(n_tokens, 1) AS INT)")
        .alias("accuracy_permille"))


def entity_prf(pred_entities: DataFrame, gold_entities: DataFrame) -> DataFrame:
    """Micro P/R/F1 over exact (span, type) matches — one output row
    with integer counts + permille metrics."""
    p = pred_entities.select(*ENTITY_KEY).distinct().withColumn("_p", F.lit(1))
    g = gold_entities.select(*ENTITY_KEY).distinct().withColumn("_g", F.lit(1))
    # one full-outer pass gives guessed/gold/correct in a single job
    # (three separate count() actions scanned both inputs three times)
    row = (p.join(g, ENTITY_KEY, "full_outer")
           .agg(F.sum("_p").alias("guessed"), F.sum("_g").alias("gold"),
                F.sum(F.col("_p") * F.col("_g")).alias("correct"))
           .collect()[0])
    guessed = int(row["guessed"] or 0)
    gold_n = int(row["gold"] or 0)
    correct = int(row["correct"] or 0)
    prec = correct * 1000 // guessed if guessed else 0
    rec = correct * 1000 // gold_n if gold_n else 0
    f1 = (2 * prec * rec) // (prec + rec) if (prec + rec) else 0
    spark = pred_entities.sparkSession
    return spark.createDataFrame(
        [(guessed, gold_n, correct, prec, rec, f1)],
        "guessed long, gold long, correct long, "
        "precision_permille long, recall_permille long, f1_permille long")


def token_prf_by_tag(pred: DataFrame, gold: DataFrame, col: str = "ner") -> DataFrame:
    """Per-tag (guessed, gold, correct, P/R permille) — distributed."""
    p = pred.select(*TOKEN_KEY, F.col(col).alias("tag"))
    g = gold.select(*TOKEN_KEY, F.col(col).alias("tag"))
    guessed = p.groupBy("tag").agg(F.count(F.lit(1)).alias("guessed"))
    goldc = g.groupBy("tag").agg(F.count(F.lit(1)).alias("gold"))
    correct = p.join(g, TOKEN_KEY + ["tag"]).groupBy("tag").agg(
        F.count(F.lit(1)).alias("correct"))
    return (
        guessed.join(goldc, "tag", "full")
        .join(correct, "tag", "left")
        .fillna(0)
        .select(
            "tag", "guessed", "gold", "correct",
            F.expr("CAST((correct * 1000) DIV greatest(guessed, 1) AS INT)")
            .alias("precision_permille"),
            F.expr("CAST((correct * 1000) DIV greatest(gold, 1) AS INT)")
            .alias("recall_permille"),
        )
    )


def uas_las(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """One row: (n_tokens, uas_permille, las_permille)."""
    j = pred.select(*TOKEN_KEY, F.col("head").alias("ph"),
                    F.col("deprel").alias("pr")).join(
        gold.select(*TOKEN_KEY, F.col("head").alias("gh"),
                    F.col("deprel").alias("gr")), TOKEN_KEY)
    ua = (F.col("ph") == F.col("gh")).cast("long")
    la = ((F.col("ph") == F.col("gh")) & (F.col("pr") == F.col("gr"))).cast("long")
    agg = j.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(ua).alias("n_ua"),
        F.sum(la).alias("n_la"),
    )
    return agg.select(
        "n_tokens",
        F.expr("CAST((n_ua * 1000) DIV greatest(n_tokens, 1) AS INT)")
        .alias("uas_permille"),
        F.expr("CAST((n_la * 1000) DIV greatest(n_tokens, 1) AS INT)")
        .alias("las_permille"))
