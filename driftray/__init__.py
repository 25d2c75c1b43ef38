"""driftray — a Ray-Data-native schema + constraint validation engine.

From-scratch rebuild of the capabilities of the Drift-ML reference
(koshishtiwari/Drift-ML, see SURVEY.md): declarative per-table schemas and
constraints (completeness, range, uniqueness, referential integrity, per-row
sha256 content invariants), per-column statistical profiles via mergeable
sketches (Welford moments, t-digest quantiles, HyperLogLog uniqueness),
and distribution-drift detection (reference unusual-ratio detector,
Kolmogorov-Smirnov, PSI, Jensen-Shannon) between stored baselines and
current windows.

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, explicit groupby/sort shuffles.  No module in this package calls
``ray.init()`` — sessions are owned by bench.py / tests / the driver.
"""

__version__ = "0.1.0"
