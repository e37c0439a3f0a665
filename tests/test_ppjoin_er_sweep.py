"""PPJoin exact set-similarity join, ER survivorship clusters, and the
interval sweep-line (operators/dedup.ppjoin_exact_pairs,
plans/curation_extra.er_entity_clusters,
plans/temporal_queries.events_concurrency_peak)."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from db_writer_redshift_spark.operators.dedup import ppjoin_exact_pairs


def _jac(a: set, b: set) -> float:
    return len(a & b) / len(a | b)


def _trigrams(text: str) -> set:
    w = text.split()
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


class TestPPJoinExact:
    def test_complete_vs_brute_force(self, spark):
        # Overlapping word sequences with a spread of Jaccard values
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = {
            1: base,
            2: base,  # identical → J = 1
            3: base + " extra tail words here",  # high J
            4: "alpha beta gamma " + "unrelated stream of other tokens",
            5: "totally different content with no shared trigrams at all",
            6: "alpha beta gamma delta epsilon zeta eta theta iota lambda",
        }
        df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
        got = {
            (r.doc_a, r.doc_b): (r.inter, r.un)
            for r in ppjoin_exact_pairs(df, "doc_id", "text", n=3).collect()
        }
        want = {}
        for a, b in combinations(sorted(docs), 2):
            sa, sb = _trigrams(docs[a]), _trigrams(docs[b])
            if sa and sb and _jac(sa, sb) >= 0.3:
                want[(a, b)] = (len(sa & sb), len(sa | sb))
        assert got == want  # zero false negatives AND zero false positives

    def test_jac_ppm_is_floor_fraction(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d e g")], "doc_id long, text string"
        )
        [r] = ppjoin_exact_pairs(df, "doc_id", "text", n=3).collect()
        assert r.jac_ppm == (1_000_000 * r.inter) // r.un

    def test_partition_invariance(self, spark):
        rows = [(i, f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 5} w{(i + 3) % 5} tail{i % 3}") for i in range(60)]
        outs = []
        for parts in (1, 16):
            df = spark.createDataFrame(rows, "doc_id long, text string").repartition(parts)
            got = sorted(
                (r.doc_a, r.doc_b, r.inter, r.un)
                for r in ppjoin_exact_pairs(df, "doc_id", "text", n=3).collect()
            )
            outs.append(got)
        assert outs[0] == outs[1]


class TestEREntityClusters:
    def test_transitive_merge_and_singletons(self, spark):
        from db_writer_redshift_spark.plans import QUERIES  # registry smoke

        assert "er_entity_clusters" in QUERIES
        # operator-level: chain a~b~c collapses into one cluster
        from db_writer_redshift_spark.operators.dedup import connected_components
        from db_writer_redshift_spark.operators.er import blocked_name_matches

        df = spark.createDataFrame(
            [
                (10, "acme corp"),
                (11, "acmee corp"),  # lev 1 from acme corp
                (12, "acmeee corp"),  # lev 1 from acmee, lev 2 from acme
                (20, "zzz gmbh"),
            ],
            "id long, name string",
        )
        edges = blocked_name_matches(df, "id", "name", max_dist=2).select(
            F.col("canonical_a").alias("doc_a"), F.col("canonical_b").alias("doc_b")
        )
        roots = {r.node: r.cluster_root for r in connected_components(edges).collect()}
        assert roots == {10: 10, 11: 10, 12: 10}  # one transitive cluster


class TestConcurrencyPeak:
    def _run(self, spark, tmp_path, rows):
        import datetime as dt

        src = spark.createDataFrame(
            [
                (
                    i,
                    dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=us),
                    uid,
                    "click",
                    1.0,
                    "{}",
                )
                for i, (uid, us) in enumerate(rows)
            ],
            "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
        )
        d = str(tmp_path / "events_sweep")
        src.write.mode("overwrite").parquet(f"{d}/events.parquet")
        from db_writer_redshift_spark.plans import QUERIES

        return {
            r.epoch_day: (r.peak_concurrency, r.n_active_sessions)
            for r in QUERIES["events_concurrency_peak"].fn(spark, d).collect()
        }

    def test_overlap_counted_and_gaps_split(self, spark, tmp_path):
        m = 60_000_000  # one minute in µs
        rows = [
            # user 1: one session 00:00–00:10
            (1, 0),
            (1, 10 * m),
            # user 2: overlapping session 00:05–00:15 → peak 2
            (2, 5 * m),
            (2, 15 * m),
            # user 3: separate session at 02:00 (gap > 30 min from others
            # is irrelevant across users; this is its own session)
            (3, 120 * m),
        ]
        day = (
            1_704_067_200_000_000 // 86_400_000_000
        )  # 2024-01-01 epoch-µs // day
        got = self._run(spark, tmp_path, rows)
        assert got == {day: (2, 3)}

    def test_midnight_crossing_session_counts_on_both_days(self, spark, tmp_path):
        m = 60_000_000
        day_us = 86_400_000_000
        # session from 23:50 to 00:05 next day (16 one-minute-apart events)
        start = day_us - 10 * m
        rows = [(7, start + i * m) for i in range(16)]
        day0 = 1_704_067_200_000_000 // day_us
        got = self._run(spark, tmp_path, rows)
        assert got == {day0: (1, 1), day0 + 1: (1, 1)}
