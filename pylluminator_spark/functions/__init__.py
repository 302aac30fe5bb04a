"""Expression-level helpers (pure ``pyspark.sql.functions`` compositions).

Everything here stays JVM-side / whole-stage-codegen — no Python UDFs.
"""

from pylluminator_spark.functions.methyl import (  # noqa: F401
    beta_expr,
    beta_to_m_expr,
    m_to_beta_expr,
    meth_unmeth_exprs,
)
from pylluminator_spark.functions.stats import (  # noqa: F401
    bh_adjust,
    norm_isf_expr,
    norm_logpdf_expr,
    norm_logsf_expr,
    norm_sf_expr,
    stouffer_combine,
)
from pylluminator_spark.functions.genomic import (  # noqa: F401
    chromosome_order_expr,
    merge_alt_chromosomes_expr,
)
