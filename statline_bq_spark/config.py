"""Configuration: TOML → typed config, environment routing, dataset lists.

Reference semantics (S24/S26): ``config.toml`` → frozen Box (reference
``config.py:8-54``), ``datasets.toml`` id list (``config.py:41-54``), and
``(gcp_env, source)`` → project/bucket/location routing (``gcpl.py:20-50``;
env validation ``utils.py:23-47``). Here the "GCP project/bucket" becomes a
storage root + catalog prefix; the same routing shape is preserved so a
deployment can map envs to real gs:// roots via the Hadoop connector.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field

VALID_ENVS = ("dev", "test", "prod")


@dataclass(frozen=True)
class EnvTarget:
    """One environment's storage/catalog target (the reference's
    project/bucket pair, ``gcpl.py:20-50``)."""

    storage_root: str
    catalog_prefix: str = ""
    location: str = "EU"


@dataclass(frozen=True)
class EngineConfig:
    envs: dict[str, EnvTarget] = field(default_factory=dict)
    datasets: tuple[str, ...] = ()


def check_env(env: str) -> str:
    """Validate the env name (reference ``utils.py:23-47``)."""
    if env not in VALID_ENVS:
        raise ValueError(f"gcp_env must be one of {VALID_ENVS}, got {env!r}")
    return env


def resolve_target(config: EngineConfig, env: str, source: str = "cbs") -> EnvTarget:
    """(env, source) → target (reference S24 ``gcpl.py:20-50``: prod splits
    cbs vs external download targets; non-cbs sources route to 'external')."""
    check_env(env)
    key = env if source == "cbs" else f"{env}_external"
    if key in config.envs:
        return config.envs[key]
    if env in config.envs:
        return config.envs[env]
    raise KeyError(f"no target configured for env={env!r} source={source!r}")


def load_config(path: str) -> EngineConfig:
    """Parse a TOML config file::

        datasets = ["83583NED", "83765NED"]

        [envs.dev]
        storage_root = "/tmp/statline"
        catalog_prefix = "dev"
    """
    with open(path, "rb") as f:
        raw = tomllib.load(f)
    envs = {
        name: EnvTarget(
            storage_root=spec["storage_root"],
            catalog_prefix=spec.get("catalog_prefix", ""),
            location=spec.get("location", "EU"),
        )
        for name, spec in raw.get("envs", {}).items()
    }
    return EngineConfig(envs=envs, datasets=tuple(raw.get("datasets", ())))
