"""Salting utilities: result equivalence with the plain formulations."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.skew import salted_join, salted_two_phase_agg
from cdc_algorithms_spark.sources.registry import load_table

from tests.conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    ev = load_table(spark, "events", SF_DIR).select("user_id", "event_type", "value")
    dim = (
        ev.groupBy("event_type").agg(F.avg("value").alias("avg_value"))
    )
    plain = ev.join(dim, "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("avg_value"), 4).alias("s")
    ).first()
    salted = salted_join(ev, dim, "event_type", num_salts=8).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("avg_value"), 4).alias("s")
    ).first()
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])


def test_salted_two_phase_agg_matches_plain(spark):
    ev = load_table(spark, "events", SF_DIR)
    plain = sorted(
        map(
            tuple,
            ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("u"))
            .collect(),
        )
    )
    salted = sorted(
        map(
            tuple,
            salted_two_phase_agg(
                ev,
                "event_type",
                [
                    F.count(F.lit(1)).alias("pn"),
                    F.collect_set("user_id").alias("pu"),
                ],
                lambda _: [
                    F.sum("pn").cast("long").alias("n"),
                    F.size(F.array_distinct(F.flatten(F.collect_list("pu")))).cast("long").alias("u"),
                ],
                num_salts=8,
            ).collect(),
        )
    )
    assert plain == salted
