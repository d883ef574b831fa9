"""Float-seam lint: no registered query may put a cross-engine
ulp-sensitive construct (pow / interpolated percentile) in its oracle
or builder. VERDICT r05 task 7 — the three r05 driver hash-reds all
rode this seam class; the lint makes the failure mode mechanical to
catch before the driver does. The whitelist must stay empty.
"""

from sig_etl_spark.queries import _SEAM_WHITELIST, float_seam_lint


def test_no_float_seams():
    problems = float_seam_lint()
    assert problems == [], "\n".join(problems)


def test_whitelist_empty():
    assert _SEAM_WHITELIST == frozenset()
