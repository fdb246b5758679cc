"""Environment profiles — dev/prod configuration for session + warehouse.

The reference deploys per-environment from rendered YAML
(``config/dev.yml:1-18``, ``config/prod.yml:1-18``,
``scripts/render_yaml.py:1-102``): environment name, database/warehouse
names, warehouse size, auto-suspend, and the schema list all vary between
dev and prod. This module is the Spark-native equivalent: a
:class:`Profile` fixes the warehouse root (TableStore), the namespace set
to bootstrap, the session sizing knobs, and the orchestrator schedule for
one environment, and ``session.get_session(profile=...)`` applies it.

Warehouse-size mapping (Snowflake XSMALL/MEDIUM -> Spark):
- ``shuffle_partitions`` — the per-stage parallelism ceiling (AQE
  coalesces below it at runtime, so oversizing is cheap and undersizing
  is not);
- ``session_conf`` — any extra spark conf (broadcast threshold, memory).
Auto-suspend has no Spark analogue beyond dynamic allocation
(``session.py`` notes): an idle local session costs nothing, and on a
cluster executor release is the runtime's job.

Profiles load from the built-in registry or from a config file. Files use
the same flat ``key: value`` + ``- item`` list subset the reference's YAML
uses, with ``${VAR}`` / ``${VAR:default}`` environment interpolation
standing in for render_yaml's template substitution — parsed here directly
so the engine adds no YAML dependency.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

_INTERP = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::([^}]*))?\}")


def interpolate(value: str) -> str:
    """Replace ``${VAR}`` / ``${VAR:default}`` with environment values.

    An unset variable with no default resolves to the empty string —
    matching shell / template semantics the reference's render step uses.
    """

    def sub(m: re.Match) -> str:
        return os.environ.get(m.group(1), m.group(2) or "")

    return _INTERP.sub(sub, value)


@dataclass(frozen=True)
class Profile:
    env: str
    warehouse_root: str
    schemas: tuple[str, ...] = (
        "external",
        "raw_co2",
        "harmonized_co2",
        "analytics_co2",
    )
    shuffle_partitions: int | None = None
    session_conf: dict[str, str] = field(default_factory=dict)
    # orchestrator cadence (reference task_schedule, config/dev.yml:17);
    # consumed by schedulers outside the engine — kept verbatim
    task_schedule: str = "0 10 * * *"
    execute_tasks_immediately: bool = True

    def resolved_root(self) -> str:
        return interpolate(self.warehouse_root)

    def store(self, **kwargs):
        """TableStore rooted at this environment's warehouse."""
        from .operators.table_store import TableStore

        return TableStore(root=self.resolved_root(), **kwargs)


PROFILES: dict[str, Profile] = {
    # dev (reference config/dev.yml): XSMALL warehouse, short suspend -> a
    # small fixed parallelism and a scratch-space warehouse root
    "dev": Profile(
        env="dev",
        warehouse_root="${SPARK_GRAFT_WAREHOUSE:/tmp/co2_warehouse}/dev",
        shuffle_partitions=8,
        session_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(16 * 1024 * 1024),
        },
        execute_tasks_immediately=True,
    ),
    # prod (reference config/prod.yml): MEDIUM warehouse, longer suspend ->
    # full-core parallelism (None -> core count) and the durable root
    "prod": Profile(
        env="prod",
        warehouse_root="${SPARK_GRAFT_WAREHOUSE:/tmp/co2_warehouse}/prod",
        shuffle_partitions=None,
        session_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        },
        execute_tasks_immediately=False,
    ),
}


def _parse_flat_yaml(text: str) -> dict:
    """Minimal parser for the flat ``key: value`` / ``- item`` YAML subset
    the reference's config files use (config/dev.yml) — scalars, strings,
    ints, bools, and one level of string lists. Comments and blank lines
    ignored; values environment-interpolated.
    """
    out: dict = {}
    current_list: str | None = None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].rstrip()
        if not line.strip():
            continue
        stripped = line.strip()
        if stripped.startswith("- "):
            if current_list is None:
                raise ValueError(f"list item outside a list: {raw!r}")
            out[current_list].append(interpolate(stripped[2:].strip().strip("\"'")))
            continue
        if ":" not in stripped:
            raise ValueError(f"unparseable config line: {raw!r}")
        key, _, val = stripped.partition(":")
        key, val = key.strip(), val.strip()
        if not val:
            out[key] = []
            current_list = key
            continue
        current_list = None
        val = interpolate(val.strip("\"'"))
        if val.lower() in ("true", "false"):
            out[key] = val.lower() == "true"
        elif re.fullmatch(r"-?\d+", val):
            out[key] = int(val)
        else:
            out[key] = val
    return out


def load_profile(path: str) -> Profile:
    """Profile from a config file (the user-editable deployment surface,
    reference ``config/*.yml``)."""
    with open(path) as f:
        cfg = _parse_flat_yaml(f.read())
    known = {
        "env",
        "warehouse_root",
        "schemas",
        "shuffle_partitions",
        "task_schedule",
        "execute_tasks_immediately",
    }
    session_conf = {
        k: str(v) for k, v in cfg.items() if k.startswith("spark.")
    }
    kwargs = {k: v for k, v in cfg.items() if k in known}
    if "schemas" in kwargs:
        kwargs["schemas"] = tuple(kwargs["schemas"])
    return Profile(session_conf=session_conf, **kwargs)


def get_profile(name_or_path: str) -> Profile:
    """Resolve a registry name ('dev', 'prod') or a config-file path."""
    if name_or_path in PROFILES:
        return PROFILES[name_or_path]
    if os.path.exists(name_or_path):
        return load_profile(name_or_path)
    raise KeyError(
        f"unknown profile {name_or_path!r} (registry: {sorted(PROFILES)})"
    )
