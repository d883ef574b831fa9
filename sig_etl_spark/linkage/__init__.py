"""Fuzzy blocked record linkage — the engine's flagship operator (J4).

Re-expresses the reference's RecordMatcher pipeline
(/root/reference/votervoice/match.py:38-88,
/root/reference/national/_1034/match.py:37-79; the scoring engine is the
public `record_matcher` library) as one declarative Spark plan:

    block equi-join -> per-column scorers -> combined score
    -> best-match window -> duplicate-count window -> match_status

Blocking bounds the pair space exactly as the reference's
``columns_to_group`` does (state blocks); at 100 TB the block join is a
keyed shuffle that AQE skew-splits (CA/TX-sized blocks), never a cross
product.
"""

from sig_etl_spark.linkage.matcher import (  # noqa: F401
    ColumnRule,
    MatchConfig,
    fuzzy_match,
    match_stats,
)
from sig_etl_spark.linkage.scorers import score_column  # noqa: F401
