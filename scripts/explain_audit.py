#!/usr/bin/env python
"""Physical-plan audit: prints the `.explain("formatted")` evidence for the
engine's key operators into PLANS.md — column pruning (ReadSchema),
predicate pushdown (PushedFilters), whole-stage codegen spans, broadcast
joins, and partial aggregation — the plan-shape properties the 100 TB
posture depends on."""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from rasusa_spark.operators.downsample import downsample  # noqa: E402
from rasusa_spark.operators.rollup import gap_fill, rollup  # noqa: E402
from rasusa_spark.session import get_spark  # noqa: E402
from rasusa_spark.sources.table import write_tokens_table  # noqa: E402
from rasusa_spark.synth import tokens_raw_df  # noqa: E402


def grab(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark("explain_audit", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    loc = "/tmp/rasusa_plan_audit_tokens"
    write_tokens_table(
        tokens_raw_df(spark, 50_000, with_tokens=False, partitions=4), loc,
        mode="overwrite",
    )
    df = spark.read.parquet(loc)

    sections = []

    sel = df.select("doc_id", "n_tok", "source", "ts")  # tokens pruned
    bucketed = sel.withColumn("bucket_start", F.date_trunc("day", "ts"))
    ds = downsample(
        bucketed, seed=42, group_cols=("source", "bucket_start"),
        mode="bases", bases=100_000, strategy="threshold",
    )
    sections.append(("threshold downsample (bases mode)", grab(ds)))

    r1h = rollup(sel, "1h")
    sections.append(("1h continuous aggregate", grab(r1h)))
    sections.append(("gap-filled 1h", grab(gap_fill(r1h, "1h"))))

    from rasusa_spark.operators.timeseries import asof_join

    aj = asof_join(
        sel, r1h, on="ts", by=("source",), right_ts="bucket_start",
        value_cols=("n_tok_sum",),
    )
    sections.append(
        ("as-of join (union-and-carry: ONE exchange on the group key + "
         "in-partition sort + last(ignorenulls) carry — no range-join "
         "blowup possible)", grab(aj))
    )

    from rasusa_spark.operators.timeseries import asof_join_skinny

    wide = df  # tokens column = the wide payload
    ajs = asof_join_skinny(
        wide, r1h, left_key="doc_id", on="ts", by=("source",),
        right_ts="bucket_start", value_cols=("n_tok_sum",),
    )
    sections.append(
        ("as-of join, SKINNY-PAYLOAD variant (the wide-row 100-TB shape): "
         "the carry-side Sort's child ReadSchema/Project excludes `tokens` "
         "entirely — only (doc_id, source, ts) pass through the window "
         "sort; the wide columns re-join on the unique key AFTER the "
         "carry, so payload bytes ride one hash exchange and never a "
         "sort buffer", grab(ajs))
    )

    aj_near = asof_join(
        sel, r1h, on="ts", by=("source",), right_ts="bucket_start",
        value_cols=("n_tok_sum",), direction="nearest",
    )
    sections.append(
        ("as-of join, direction='nearest' (both carries over the SAME "
         "exchange: one Exchange hashpartitioning(source), two in-"
         "partition Sorts — ascending and descending — never a second "
         "shuffle)", grab(aj_near))
    )

    from rasusa_spark.functions.histsketch import (
        histogram_rollup,
        histogram_rollup_from_finer,
    )

    hist_d1 = histogram_rollup_from_finer(
        histogram_rollup(sel, "1h"), "1d"
    )
    sections.append(
        ("histogram sketch tier cascade (32 conditional-count partial+final "
         "HashAggregates, then elementwise bin re-sum — all codegen, zero "
         "Python; the mergeable-quantile analog of the sum tiers)",
         grab(hist_d1))
    )

    pruned = df.where((F.col("source") == "wiki")).select("doc_id", "n_tok")
    sections.append(("partition-pruned narrow scan", grab(pruned)))

    from rasusa_spark.operators.paired import downsample_templates

    tpl = downsample_templates(
        sel, seed=42, mode="bases", bases=100_000, group_cols=("source",),
        template_col="doc_id", strategy="window",
    )
    sections.append(
        ("template two-pass downsample (skinny per-template agg + semi-join)",
         grab(tpl))
    )

    docs_path = "/root/testdata/sf0.001/documents.parquet"
    if os.path.exists(docs_path):
        from rasusa_spark.operators.dedup import minhash_signatures

        docs = spark.read.parquet(docs_path)
        sigs = minhash_signatures(docs, n_perm=16)
        sections.append(
            ("minhash signatures (pure JVM: one shuffle, 16 partial+final "
             "min-aggregate pairs, zero Python)", grab(sigs))
        )

        from rasusa_spark.operators.dedup import (
            minhash_signatures_oph,
            ngram_contamination,
            ngram_jaccard_pairs,
        )

        sections.append(
            ("one-permutation minhash (1 hash/shingle; conditional-min bins "
             "+ log-rounds JVM densify)", grab(minhash_signatures_oph(docs, n_perm=16)))
        )
        sections.append(
            ("prefix-filtered jaccard (fused rarest-first per-doc aggregate "
             "feeds prefix AND verification)",
             grab(ngram_jaccard_pairs(docs, threshold=0.6)))
        )
        probes = docs.where(F.col("doc_id") % 20 == 0)
        sections.append(
            ("contamination check (probe shingles broadcast; corpus side "
             "never shuffled before the semi-join)",
             grab(ngram_contamination(docs.where(F.col("doc_id") % 20 != 0),
                                      probes)))
        )

        from rasusa_spark.operators.dedup import line_dedup

        sections.append(
            ("corpus-level line dedup (first-occurrence via map-side-"
             "combinable min-struct agg — two exchanges, no join, no window)",
             grab(line_dedup(docs)))
        )

        from rasusa_spark.operators.pack import pack_sequences
        from rasusa_spark.operators.text import token_count

        sized = docs.select("source", "doc_id",
                            token_count(F.col("text")).alias("n_tok"))
        sections.append(
            ("sequence packing (one shuffle on group cols; Arrow-batched "
             "per-group kernel loops over packs, not rows)",
             grab(pack_sequences(sized, capacity=256)))
        )

        from rasusa_spark.operators.text import vocab_stats

        sections.append(
            ("corpus vocab frequencies (map-side-combinable count; top-k is "
             "TakeOrdered over the aggregated table, no full sort)",
             grab(vocab_stats(docs, k=20)))
        )

        import __spark_entry__ as entrymod

        sections.append(
            ("star-join dimension enrichment (explicit broadcasts on tiny "
             "dims; partial+final HashAggregate)",
             grab(entrymod.q_region_revenue(spark, "/root/testdata/sf0.001")))
        )

    embs_path = "/root/testdata/sf0.001/embeddings.parquet"
    if os.path.exists(embs_path):
        from rasusa_spark.operators.similarity import (
            ivf_build_centroids,
            ivf_topk_pruned,
            write_ivf_partitioned,
        )

        embs = spark.read.parquet(embs_path)
        cents = ivf_build_centroids(embs, n_cells=8, sample=256, seed=5)
        ivf_loc = "/tmp/rasusa_plan_audit_ivf"
        write_ivf_partitioned(embs, ivf_loc, cents)
        sections.append(
            ("IVF ANN over a cell-partitioned store (probe list -> "
             "PartitionFilters: non-probed cells never read — the 100-TB "
             "pruning posture, on disk, not a docstring)",
             grab(ivf_topk_pruned(spark, ivf_loc, [1.0] * 64, cents,
                                  k=10, nprobe=3)))
        )

    if os.path.exists(docs_path):
        from rasusa_spark.plans.prepare import prepare_training_data

        prep = prepare_training_data(
            docs.where(F.col("doc_id") % 20 != 0),
            seed=42, quality_min_score=0.2, max_top_2gram_frac=0.5,
            probes=probes, jaccard_threshold=None,  # CC stage is iterative
        )
        sections.append(
            ("prep pipeline stages 1-4 (exact dedup -> quality -> repetition "
             "-> decontamination) as ONE fused plan", grab(prep))
        )

    # round-4 timeseries/analytics surface
    from rasusa_spark.functions.cms import (
        cms_estimate,
        cms_from_finer,
        cms_partials,
    )
    from rasusa_spark.operators.timeseries import (
        counter_increase,
        m4_downsample,
        rollup_sliding,
        sessionize,
        time_weighted_avg,
    )

    sections.append(
        ("sessionize (built-in session_window: ONE user-keyed exchange, "
         "partial+final session merge inside the aggregate)",
         grab(sessionize(sel, "30 minutes", user_col="source",
                         value_col="n_tok")))
    )
    sections.append(
        ("sliding-window rollup (F.window width=1h slide=15m: window "
         "assignment is a JVM explode projection feeding ONE combinable "
         "groupBy — no self-join, no range join)",
         grab(rollup_sliding(sel, 3600, 900)))
    )
    sections.append(
        ("M4 visual downsampling (one partial+final HashAggregate; "
         "first/last as struct min/max — no window, no sort)",
         grab(m4_downsample(sel, 1800, ts_col="ts", value_col="n_tok")))
    )
    sections.append(
        ("counter increase (one series-keyed window sort + one combinable "
         "(series, bucket) groupBy)",
         grab(counter_increase(sel, 3600, series_cols=("source",),
                               id_col="doc_id")))
    )
    sections.append(
        ("time-weighted average (one (series, bucket)-keyed window + "
         "combinable groupBy; integer-micros segments)",
         grab(time_weighted_avg(sel, 3600, series_cols=("source",),
                                id_col="doc_id")))
    )
    from rasusa_spark.operators.cohort import (
        cohort_retention,
        event_transitions,
        funnel,
    )

    sections.append(
        ("cohort retention (distinct activity -> per-user min-day dim -> "
         "offset counts; no raw self-join)",
         grab(cohort_retention(sel.withColumnRenamed("doc_id", "u0"),
                               user_col="source")))
    )
    sections.append(
        ("funnel (k chained per-user min-aggregations over the "
         "step-filtered skinny table — k user-keyed shuffles over "
         "shrinking tables, no window over raw events)",
         grab(funnel(sel.withColumn("event_type", F.col("source")),
                     ["web", "books"], user_col="doc_id")))
    )
    sections.append(
        ("event transitions (one user-keyed window + one combinable "
         "groupBy; |types|^2 output)",
         grab(event_transitions(sel.withColumn("event_type", F.col("source")),
                                user_col="doc_id", id_col="doc_id")))
    )
    h1 = cms_partials(sel, "1h", item_col="doc_id")
    d1 = cms_from_finer(h1, "1d")
    cand = spark.range(0, 50).withColumnRenamed("id", "item")
    sections.append(
        ("CMS tier: build = inline + ONE combinable groupBy; cascade = "
         "combinable groupBy-sum over skinny state; estimate = broadcast "
         "probe grid LEFT JOIN + min-of-d (candidate side explicitly "
         "broadcast — state side never re-shuffled wide)",
         grab(cms_estimate(d1, cand, item_col="item")))
    )

    from rasusa_spark.operators.timeseries import (
        gauge_delta,
        gauge_deriv,
        heavy_hitters,
        topn_rollup,
    )

    sections.append(
        ("gauge delta (ONE combinable min_by/max_by groupBy on the "
         "(ts, id) order key — no window, no per-series sort)",
         grab(gauge_delta(sel, 3600, series_cols=("source",),
                          value_col="n_tok", id_col="doc_id")))
    )
    sections.append(
        ("gauge deriv (five integer sufficient statistics in ONE "
         "combinable groupBy; slope = scalar double projection)",
         grab(gauge_deriv(sel, 3600, series_cols=("source",),
                          value_col="n_tok")))
    )
    sections.append(
        ("top-N + __others__ rollup (combinable (bucket, key) groupBy -> "
         "rank window over the AGGREGATED table only -> skinny fold)",
         grab(topn_rollup(sel, 3600, 3, key_col="source",
                          value_col="n_tok")))
    )
    sections.append(
        ("exact heavy hitters (combinable (bucket, key) count is the only "
         "data-scale exchange; totals = second agg over the aggregate; "
         "phi filter joins two aggregate tables)",
         grab(heavy_hitters(sel, 3600, 0.01, key_col="source")))
    )
    from rasusa_spark.operators.timeseries import (
        ohlc_rollup,
        predict_linear,
        prom_rate,
        state_durations,
    )

    sections.append(
        ("OHLC/candlestick (ONE combinable min_by/max_by groupBy carrying "
         "the (micros, id) order keys — same shape as gauge delta)",
         grab(ohlc_rollup(sel, 3600, series_cols=("source",),
                          value_col="n_tok", id_col="doc_id")))
    )
    sections.append(
        ("state durations (one series-keyed window for lead(), bounded "
         "bucket-grid explode, ONE combinable groupBy — no spine join "
         "against raw)",
         grab(state_durations(
             sel.withColumn("state", (F.col("n_tok") % 3).cast("string")),
             3600, series_cols=("source",), state_col="state",
             id_col="doc_id")))
    )
    sections.append(
        ("predict_linear (the deriv carrier's combinable groupBy + scalar "
         "double finalizer — no extra exchange over gauge_deriv)",
         grab(predict_linear(sel, 3600, 900, series_cols=("source",),
                             value_col="n_tok")))
    )
    sections.append(
        ("PromQL extrapolated rate (window partitioned by (series, "
         "bucket) — partition size is one bucket of one series — then "
         "ONE combinable groupBy + scalar finalizer)",
         grab(prom_rate(sel, 3600, series_cols=("source",),
                        value_col="n_tok", id_col="doc_id")))
    )
    from rasusa_spark.operators.cohort import cohort_retention_filled

    sections.append(
        ("gap-filled retention triangle (spine = sequence explode from "
         "the cohort DIM + one-row broadcast last-day; left join fills "
         "zeros — raw events touched once, by cohort_retention)",
         grab(cohort_retention_filled(
             sel.withColumn("user_id", F.col("doc_id")))))
    )

    # incremental dedup store probe: write a tiny store, then show the
    # shard PartitionFilters pruning on the stored-bands read
    from rasusa_spark.streaming.dedup_inc import merge_minhash_increment

    docs_loc = "/tmp/rasusa_plan_audit_docs"
    ded_state = "/tmp/rasusa_plan_audit_dedup"
    import shutil

    shutil.rmtree(ded_state, ignore_errors=True)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    shutil.rmtree(docs_loc, ignore_errors=True)
    docs.coalesce(1).write.parquet(docs_loc)
    import glob as _glob

    dfiles = sorted(_glob.glob(f"{docs_loc}/*.parquet"))
    merge_minhash_increment(spark, docs, ded_state, files=dfiles)
    stored = spark.read.parquet(os.path.join(ded_state,
                                             "minhash_store", "bands"))
    probe = stored.where(F.col("shard").isin([0, 1, 2, 3])).groupBy(
        "band", "bucket"
    ).count()
    sections.append(
        ("incremental dedup store probe (bands/txn=*/shard=* layout: the "
         "new-batch band join reads ONLY touched shards — look for "
         "PartitionFilters on `shard`)",
         grab(probe))
    )

    # incremental IVF store probe: pinned-codebook store, search prunes
    # on the ivf_cell partition column across all txn directories
    from rasusa_spark.streaming.ann_inc import (
        ivf_store_topk,
        merge_ivf_increment,
    )

    ivf_state = "/tmp/rasusa_plan_audit_ivf"
    shutil.rmtree(ivf_state, ignore_errors=True)
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb_loc = "/tmp/rasusa_plan_audit_embs"
    shutil.rmtree(emb_loc, ignore_errors=True)
    embs.coalesce(1).write.parquet(emb_loc)
    efiles = sorted(_glob.glob(f"{emb_loc}/*.parquet"))
    merge_ivf_increment(spark, embs, ivf_state, files=efiles)
    dim = len(embs.select("embedding").first()[0])
    sections.append(
        ("incremental IVF store probe (cells/txn=*/ivf_cell=* layout: "
         "search reads ONLY the nprobe probed cells — look for "
         "PartitionFilters on `ivf_cell`)",
         grab(ivf_store_topk(spark, ivf_state, [1.0] * dim, nprobe=3)))
    )

    # round-6 operators
    from rasusa_spark.operators.mix import mix_corpus
    from rasusa_spark.operators.rollup import realtime_rollup
    from rasusa_spark.operators.similarity import (
        ivf_build_centroids,
        ivfadc_topk,
        pq_train_codebooks,
        semantic_dedup,
        write_ivfadc,
    )
    from rasusa_spark.operators.text import token_count

    docs_lang = docs.withColumn("n_tok", token_count(F.col("text")))
    sections.append(
        ("domain-mixture resampling (mix_corpus: ONE broadcast budget-dim "
         "join + the threshold kernel — look for the BroadcastHashJoin on "
         "the (domain, budget) dim and partial/final HashAggregate pairs, "
         "no per-domain sort of the corpus)",
         grab(mix_corpus(docs_lang, {"en": 0.6, "zh": 0.4}, 10_000, seed=0,
                         domain_col="lang")))
    )

    stored_1h = rollup(sel, "1h")
    sections.append(
        ("real-time continuous aggregate (realtime_rollup: stored tier "
         "filtered bucket_start < watermark UNION one combinable groupBy "
         "over only the raw tail ts >= watermark — look for the pushed "
         "ts filter on the raw-side scan)",
         grab(realtime_rollup(stored_1h, sel, "1h",
                              watermark="2026-01-08 00:00:00")))
    )

    embs6 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sections.append(
        ("semantic dedup pair stage (within-IVF-cell self-join: the only "
         "pair work is the equi-join on ivf_cell — no crossJoin of the "
         "corpus; closure runs over the pair table, not raw)",
         grab(semantic_dedup(embs6, threshold=0.4, n_cells=8, sample=256)))
    )

    cents6 = ivf_build_centroids(embs6, n_cells=8, sample=256)
    books6 = pq_train_codebooks(embs6, n_sub=8, k=16, sample=256)
    ivfadc_loc = "/tmp/rasusa_plan_audit_ivfadc"
    write_ivfadc(embs6, ivfadc_loc, cents6, books6)
    sections.append(
        ("IVFADC search (cell-partitioned PQ codes store: look for "
         "PartitionFilters on ivf_cell AND a ReadSchema of only "
         "(vec_id, pq_codes) — no vector column anywhere in the ADC "
         "shortlist scan; the exact re-rank joins the tiny shortlist "
         "back broadcast)",
         grab(ivfadc_topk(spark, ivfadc_loc, embs6, [1.0] * 64, cents6,
                          books6, k=5, shortlist=20, nprobe=3)))
    )

    from rasusa_spark.operators.dsir import dsir_scores
    from rasusa_spark.operators.timeseries import holt_winters

    sections.append(
        ("DSIR importance scores (target bucket counts broadcast into the "
         "per-doc scoring join; two combinable HashAggregate pairs over "
         "the exploded features, one over (doc, bucket) — no windows, no "
         "Python, integer dot-product aggregate)",
         grab(dsir_scores(docs, docs.limit(40), n_buckets=1000)))
    )
    sections.append(
        ("holt_winters (PromQL double exponential smoothing: ONE "
         "combinable groupBy collecting each bucket's bounded sample "
         "array, the recurrence folded JVM-side — no window over raw, "
         "no Python)",
         grab(holt_winters(sel.withColumn("value", F.col("n_tok")
                                          .cast("double")),
                           3600, 0.4, 0.3, value_col="value")))
    )

    out = ["# PLANS — physical-plan audit (auto-generated by scripts/explain_audit.py)",
           "",
           "What to look for: `ReadSchema` never includes `tokens` on selection",
           "paths (column pruning); `PartitionFilters` on source/day predicates;",
           "`BroadcastHashJoin` for the verdict join — picked by AQE from",
           "runtime stats since round 2 (no static hint: a 10^5-group",
           "histogram must NOT be force-broadcast), never a shuffle join of",
           "the fact table at this scale; `HashAggregate` pairs (partial + final = map-side",
           "combine); `WholeStageCodegen` spans covering the scan→project→filter",
           "pipelines.", ""]
    for title, text in sections:
        out += [f"## {title}", "", "```", text.rstrip(), "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
