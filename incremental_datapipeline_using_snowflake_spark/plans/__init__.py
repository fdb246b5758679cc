from .pipeline import (
    analytics,
    analytics_daily,
    analytics_weekly,
    bootstrap,
    harmonize,
    load_raw,
)
from .orchestrator import Orchestrator

__all__ = [
    "bootstrap",
    "load_raw",
    "harmonize",
    "analytics",
    "analytics_daily",
    "analytics_weekly",
    "Orchestrator",
]
