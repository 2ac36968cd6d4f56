"""rasusa_spark — PySpark-native rollup + downsample + retention engine.

Public API surface (see README.md):

- :mod:`rasusa_spark.operators.downsample` — budget/count/frac/one-pass
  subsampling (the rasusa `reads` analog)
- :mod:`rasusa_spark.operators.depthcap` — sweep-line depth capping (`aln`)
- :mod:`rasusa_spark.operators.rollup` — continuous aggregates + gap-fill
- :mod:`rasusa_spark.plans.checkpoint` — resumable runs + lineage
- :mod:`rasusa_spark.rng` — bit-exact port of the reference RNG stack
"""

__version__ = "0.1.0"
