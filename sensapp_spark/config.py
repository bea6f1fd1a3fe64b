"""Engine configuration, mirroring the reference's env-var surface.

Reference: /root/reference/src/config/mod.rs:18-32 — the same env names are
honored so an operator of the reference can point their deployment scripts at
this engine unchanged.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env_int(name: str, default: int) -> int:
    raw = os.environ.get(name)
    if raw is None or raw == "":
        return default
    return int(raw)


@dataclass
class SensAppConfig:
    # Ingestion batching (reference src/config/mod.rs:28-29). In Spark this
    # maps to Arrow batch sizing + streaming trigger sizing, not bin packing.
    batch_size: int = field(default_factory=lambda: _env_int("SENSAPP_BATCH_SIZE", 8192))
    # Cap on rows examined by CSV type inference (src/config/mod.rs:24-26).
    max_inference_rows: int = field(
        default_factory=lambda: _env_int("SENSAPP_MAX_INFERENCES_ROWS", 128)
    )
    # Salt for deterministic sensor UUIDs (src/config/mod.rs:31-32).
    sensor_salt: str = field(
        default_factory=lambda: os.environ.get("SENSAPP_SENSOR_SALT", "sensapp")
    )
    # Default per-sensor row limit for queries (src/storage/mod.rs:15-17).
    default_query_limit: int = 10_000_000
    # PromQL instant-query lookback (src/ingestors/http/simple_promql.rs:25).
    default_lookback_ms: int = 3_600_000


CONFIG = SensAppConfig()
