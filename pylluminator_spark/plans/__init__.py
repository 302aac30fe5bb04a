"""Session / lineage management."""

from pylluminator_spark.plans.session import MethylSession, assemble_signal  # noqa: F401
