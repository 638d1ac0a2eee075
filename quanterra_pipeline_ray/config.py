"""Environment-keyed maintenance settings registry.

Rebuilds the reference's main extension mechanism — the dev/prod pydantic
settings registry (reference
`src/models/config/pipeline_settings.py:24-37,40-263`, generic
``BaseEnvironmentSettings._settings`` lookup at `:32-37`) — as a plain
dataclass registry: one frozen settings object per environment, a generic
``register``/``for_env`` lookup, and the same dev-vs-prod shape the
reference uses (dev = small volumes for fast iteration, prod = full scale).
"""

from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class MaintenanceSettings:
    """Every knob a maintenance run reads, in one env-keyed object."""

    env: str = "dev"
    # compaction
    target_file_bytes: int = 32 << 20
    carry_forward_ratio: float = 0.75
    # clustering
    target_rows: int = 200_000
    ts_bucket_us: int = 3_600_000_000
    part_bits: int | None = None
    curve: str = "z"
    hot_conv_threshold_rows: int | None = None
    # merge
    merge_broadcast_threshold: int = 200_000
    # expiry
    expire_keep_last: int = 2
    orphan_min_age_s: float = 3600.0

    def with_overrides(self, **kw) -> "MaintenanceSettings":
        return replace(self, **{k: v for k, v in kw.items() if v is not None})


class SettingsRegistry:
    """Generic env -> settings lookup (the reference's ``_settings`` dict)."""

    def __init__(self):
        self._settings: dict[str, MaintenanceSettings] = {}

    def register(self, settings: MaintenanceSettings) -> None:
        self._settings[settings.env] = settings

    def for_env(self, env: str) -> MaintenanceSettings:
        if env not in self._settings:
            raise KeyError(
                f"unknown environment {env!r}; registered: {sorted(self._settings)}"
            )
        return self._settings[env]

    def environments(self) -> list[str]:
        return sorted(self._settings)


REGISTRY = SettingsRegistry()
REGISTRY.register(
    MaintenanceSettings(
        env="dev",
        target_file_bytes=4 << 20,
        target_rows=20_000,
        expire_keep_last=2,
    )
)
REGISTRY.register(
    MaintenanceSettings(
        env="prod",
        target_file_bytes=128 << 20,
        target_rows=500_000,
        hot_conv_threshold_rows=1_000_000,
        expire_keep_last=5,
    )
)


def get_settings(env: str = "dev") -> MaintenanceSettings:
    return REGISTRY.for_env(env)
