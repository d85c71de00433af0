

def test_adaptive_dispatch_is_value_invisible(spark):
    """Both adaptive arms must return identical rows (IVF probing is
    certified exact), so the cardinality dispatch can never change
    results — asserted directly, not just via the shared oracle."""
    from car_etl_spark.queries.vector import (
        vector_ivf_topk,
        vector_topk,
        vector_topk_adaptive,
    )
    from tests.conftest import SF_SMALL

    brute = [tuple(r) for r in vector_topk(spark, SF_SMALL).collect()]
    ivf = [tuple(r) for r in vector_ivf_topk(spark, SF_SMALL).collect()]
    adaptive = [tuple(r) for r in vector_topk_adaptive(spark, SF_SMALL).collect()]
    assert brute == ivf == adaptive


def test_adaptive_threshold_reads_footer_not_scan(spark):
    from car_etl_spark.queries.vector import _corpus_rowcount
    from tests.conftest import SF_SMALL

    n = _corpus_rowcount(SF_SMALL)
    assert n > 0
    assert _corpus_rowcount("/nonexistent") == -1
