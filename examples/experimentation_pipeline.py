"""Experimentation end-to-end: assign → SRM gate → balance check →
effect estimation (fixed-horizon, nonparametric, always-valid) →
variance reduction → multiple-testing control → observational rescue.

The full decision path an experiment platform runs over the engine's
event spine, composed from the experiment/causal operator family:

  1. deterministic hash ASSIGNMENT of users to control/treatment
     (``entity_split`` semantics — no RNG state, replayable);
  2. SRM chi-square gate (``srm_check``) — if assignment is broken,
     stop reading metrics;
  3. covariate balance SMD table (``covariate_balance``) on
     pre-experiment covariates;
  4. effect readout three ways: Welch z (``ab_test``), Mann–Whitney U
     rank-sum for the skewed metric (``mann_whitney_u``), and the
     approximate randomization test (``permutation_test``);
  5. CUPED variance reduction with the pre-period covariate, showing
     the shrunken confidence interval;
  6. always-valid mSPRT p-value (``msprt_test``) — the peeking-proof
     monitor;
  7. BH false-discovery-rate control (``fdr_bh``) across the metric
     family;
  8. the observational rescue lane: when assignment ISN'T randomized,
     fit propensities deterministically and compare the naive
     difference against IPW/doubly-robust (``ipw_estimate``) and
     subclassification (``stratified_att``) — both recover the planted
     effect the naive mean misses.

Run: python examples/experimentation_pipeline.py  (local[8], ~1 min)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from temporalscope_spark.session import get_spark


def main() -> None:
    spark = get_spark("experimentation", master="local[8]", shuffle_partitions=8)
    from temporalscope_spark.operators.experiment import (
        ab_test,
        covariate_balance,
        cuped_adjust,
        fdr_bh,
        ipw_estimate,
        mann_whitney_u,
        msprt_test,
        permutation_test,
        srm_check,
        stratified_att,
    )

    # --- synthetic experiment log: 20k users, deterministic assignment,
    # pre-period covariate x, metric y = x + effect + skewed noise
    n = 20_000
    users = spark.range(n).select(F.col("id").alias("user_id"))
    u = (
        F.conv(F.substring(F.md5(F.concat_ws("#", "user_id", F.lit("exp1"))), 1, 15), 16, 10)
        .cast("long") % 1000000000
    ).cast("double") / F.lit(1e9)
    x = (F.col("user_id") % 97).cast("double") / 97.0 * 10.0          # pre-period
    noise = F.pow((F.col("user_id") * 2654435761 % 1000).cast("double") / 1000.0, 3.0) * 4.0
    log = users.select(
        "user_id",
        F.when(u < 0.5, F.lit("treatment")).otherwise(F.lit("control")).alias("variant"),
        x.alias("x_pre"),
    ).withColumn(
        "y",
        F.col("x_pre") + noise + F.when(F.col("variant") == "treatment", 0.25).otherwise(0.0),
    ).cache()

    print("=== 1. SRM gate ===")
    srm = srm_check(log, "variant", {"treatment": 0.5, "control": 0.5}).collect()[0]
    print(f"n={srm['n']}  chi2={srm['chi2']:.4f}  max_abs_dev={srm['max_abs_dev']}")
    assert srm["chi2"] < 10.0, "sample-ratio mismatch — stop the experiment"

    print("=== 2. covariate balance (pre-period) ===")
    for r in covariate_balance(log, "variant", "treatment", "control", ["x_pre"]).collect():
        print(f"{r['covariate']}: smd={r['smd']}  var_ratio={r['var_ratio']}")

    print("=== 3. effect readout ===")
    for r in ab_test(log, "variant", "y", "control").collect():
        print(f"{r['variant']}: mean={r['mean']}  diff={r['diff']}  z={r['z']}")
    mw = mann_whitney_u(log, "y", "variant", "treatment", "control").collect()[0]
    print(f"Mann-Whitney z={mw['z']}")
    pt = permutation_test(
        log, "y", "variant", "treatment", "control", n_perm=60, id_col="user_id"
    ).collect()[0]
    print(f"randomization test p={pt['p_value']} (diff={pt['diff']})")

    print("=== 4. CUPED variance reduction ===")
    adj = cuped_adjust(log, "y", "x_pre", keep_cols=["user_id", "variant"])
    for r in ab_test(adj, "variant", "y_cuped", "control").collect():
        if r["variant"] == "treatment":
            print(f"CUPED diff={r['diff']}  z={r['z']} (vs raw z above — tighter)")

    print("=== 5. always-valid mSPRT ===")
    sp = msprt_test(log, "y", "variant", "treatment", "control", tau2=0.1).collect()[0]
    print(f"lambda={sp['lambda_n']}  always-valid p={sp['p_value']}")

    print("=== 6. FDR across the metric family ===")
    fam = spark.createDataFrame(
        [("y_primary", 0.003), ("y_guard1", 0.21), ("y_guard2", 0.04),
         ("y_guard3", 0.66)],
        "test string, p double",
    )
    for r in fdr_bh(fam, "p", "test").orderBy("p_adj").collect():
        print(f"{r['test']}: p={r['p']}  p_adj={r['p_adj']}")

    print("=== 7. observational rescue (confounded assignment) ===")
    p_obs = F.lit(0.2) + F.lit(0.6) * (F.col("x_pre") / 10.0)
    u2 = (
        F.conv(F.substring(F.md5(F.concat_ws("#", "user_id", F.lit("obs"))), 1, 15), 16, 10)
        .cast("long") % 1000000000
    ).cast("double") / F.lit(1e9)
    obs = log.select(
        "user_id", "x_pre", p_obs.alias("p"), (u2 < p_obs).cast("double").alias("t")
    ).withColumn("y", F.col("x_pre") + F.lit(2.0) * F.col("t"))
    naive = obs.groupBy().agg(
        (F.sum(F.col("t") * F.col("y")) / F.sum("t")
         - F.sum((1 - F.col("t")) * F.col("y")) / F.sum(1 - F.col("t"))).alias("d")
    ).first()["d"]
    ipw = ipw_estimate(obs, "y", "t", "p").collect()[0]
    att = stratified_att(obs, "y", "t", "p", n_strata=10).collect()[0]
    print(f"true effect = 2.0; naive diff = {naive:.3f} (confounded)")
    print(f"IPW ate = {ipw['ate']}  subclassification att = {att['att']}")
    assert abs(naive - 2.0) > 0.3
    assert abs(ipw["ate"] - 2.0) < 0.2 and abs(att["att"] - 2.0) < 0.2

    print("EXPERIMENTATION PIPELINE COMPLETE")
    spark.stop()


if __name__ == "__main__":
    main()
