"""Scalar function library (SURVEY.md §2.3, F1-F13).

Every reference string/regex/date/score routine re-expressed as a
composable PySpark *column expression factory* — pure `pyspark.sql.functions`
(JVM-side, whole-stage-codegen-friendly), no Python UDFs in the hot path.
"""

from sig_etl_spark.functions.names import (  # noqa: F401
    extract_nickname,
    extract_suffix,
    parse_name,
    strip_honorifics,
    strip_parenthetical,
)
from sig_etl_spark.functions.text import (  # noqa: F401
    fold_ascii,
    key_value_map,
    normalize_via_map,
    parse_election_location,
    parse_party_state_district,
    strip_leading_zeros,
    url_tail_id,
)
from sig_etl_spark.functions.explode import split_multi_candidate  # noqa: F401
from sig_etl_spark.functions.translit import (  # noqa: F401
    fold_ascii_full,
    fold_ascii_py,
)
from sig_etl_spark.functions.dates import parse_long_date  # noqa: F401
from sig_etl_spark.functions.scores import (  # noqa: F401
    glyph_translate,
    good_bad_pct,
    vote_index,
)
