from cdc_algorithms_spark.chunkers.params import (
    AeParams,
    FastCdcParams,
    RabinParams,
    make_params,
)
from cdc_algorithms_spark.chunkers.core import (
    ae_cuts_py,
    fastcdc_cuts_py,
    fixed_cuts,
    rabin_cuts_py,
)
from cdc_algorithms_spark.chunkers.fast import (
    ae_bounds,
    ae_cuts,
    fastcdc_bounds,
    fastcdc_cuts,
    rabin_bounds,
    rabin_cuts,
)

__all__ = [
    "AeParams",
    "FastCdcParams",
    "RabinParams",
    "make_params",
    "fixed_cuts",
    "ae_cuts_py",
    "rabin_cuts_py",
    "fastcdc_cuts_py",
    "ae_cuts",
    "rabin_cuts",
    "fastcdc_cuts",
    "ae_bounds",
    "rabin_bounds",
    "fastcdc_bounds",
]
