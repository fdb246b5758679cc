from .kernels import (
    normalize_value,
    pct_change,
    register_all_udfs,
    volatility,
)

__all__ = ["pct_change", "volatility", "normalize_value", "register_all_udfs"]
