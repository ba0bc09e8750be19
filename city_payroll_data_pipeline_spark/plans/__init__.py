"""Industry transform plans (the medallion DAG as function composition).

Each reference SQLMesh model file becomes one pure
``DataFrame -> DataFrame`` function; the SQLMesh dependency DAG
(raw CSV -> stg_<industry> -> fct_<industry>) becomes explicit
composition ``fct(stg(raw))``. Catalyst sees the whole chain as one
logical plan, so column pruning and filter pushdown traverse both
layers — something the reference's materialize-each-layer design
cannot do.
"""

from city_payroll_data_pipeline_spark.plans import corporate, education, hospital

PIPELINES = {
    "corporate": (corporate.stg_corporate, corporate.fct_corporate),
    "education": (education.stg_education, education.fct_education),
    "hospital": (hospital.stg_hospital, hospital.fct_hospital),
}


def run_pipeline(industry: str, raw_df, processed_at=None):
    """raw (all-string) DataFrame -> fact DataFrame for one industry."""
    stg, fct = PIPELINES[industry]
    return fct(stg(raw_df, processed_at=processed_at))


__all__ = ["PIPELINES", "run_pipeline", "corporate", "education", "hospital"]
