"""Config source (S11) — ``config.json`` / ``.env`` settings with the
reference's validation semantics, re-implemented without pydantic.

Reference: 2_Aplikacja_Glowna/config.py:26-160 — an ``AppSettings`` model
whose OpenCV kernel parameters are coerced to valid odd integers
(``_coerce_odd``: non-int → default; ≤1 → default; even → +1; pinned by
tests/test_config_validation.py:8-11), loaded from ``config.json`` when
present, else from ``KEY=VALUE`` lines in ``.env``.  The GUI/binary-path
fields are presentation config; the engine-relevant knobs (OCR language,
psm/oem, dpi, workers, blur/block/C) keep the reference's code defaults
(config.py:96-100: blur 3, block 11, C 2 — the shipped config.json
overrides them to 5/21/5).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, fields
from pathlib import Path
from typing import Any, Mapping


def coerce_odd(value: Any, default: int) -> int:
    """Coerce to a valid odd kernel size > 1 (config.py:26-40):
    unparseable → default; ≤ 1 → default (or 3 when the default itself is
    ≤ 1); even → value + 1."""
    try:
        v = int(value)
    except (TypeError, ValueError):
        v = default
    if v <= 1:
        v = default if default > 1 else 3
    if v % 2 == 0:
        v += 1
    return v


@dataclass
class AppSettings:
    """Engine-relevant settings with the reference's code defaults."""

    tesseract_folder: str = ""
    poppler_folder: str = ""
    ocr_language: str = "pol"
    ocr_psm: int = 3
    ocr_oem: int = 3
    default_output_subdir: str = "zarchiwizowane"
    ocr_dpi: int = 300
    ocr_workers: int = 0          # 0 = auto-detect (→ Spark parallelism)
    blur_kernel_size: int = 3
    adaptive_threshold_block_size: int = 11
    adaptive_threshold_c: int = 2

    def __post_init__(self) -> None:
        self.blur_kernel_size = coerce_odd(self.blur_kernel_size, 3)
        self.adaptive_threshold_block_size = coerce_odd(
            self.adaptive_threshold_block_size, 11
        )


_FIELD_NAMES = {f.name for f in fields(AppSettings)}
_INT_FIELDS = {f.name for f in fields(AppSettings) if f.type == "int"}


def _parse_env_lines(text: str) -> dict[str, str]:
    """``KEY=VALUE`` lines; blanks and ``#`` comments skipped
    (config.py:119-128)."""
    data: dict[str, str] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, value = line.split("=", 1)
        data[key.strip()] = value.strip()
    return data


def settings_from_mapping(data: Mapping[str, Any]) -> AppSettings:
    """Build settings from a raw dict, ignoring unknown keys (the GUI
    fields) and coercing int fields the way the env path needs."""
    kwargs: dict[str, Any] = {}
    for k, v in data.items():
        if k not in _FIELD_NAMES:
            continue
        if k in _INT_FIELDS and not isinstance(v, int):
            try:
                v = int(v)
            except (TypeError, ValueError):
                continue  # fall back to the field default
        kwargs[k] = v
    return AppSettings(**kwargs)


def load_settings(
    config_path: str | Path | None = None,
    env_path: str | Path | None = None,
) -> AppSettings:
    """``config.json`` wins; else ``.env``; else defaults
    (config.py:130-142)."""
    if config_path is not None and Path(config_path).exists():
        return settings_from_mapping(
            json.loads(Path(config_path).read_text(encoding="utf-8"))
        )
    if env_path is not None and Path(env_path).exists():
        return settings_from_mapping(
            _parse_env_lines(Path(env_path).read_text(encoding="utf-8"))
        )
    return AppSettings()
