"""S11 config source: odd-kernel coercion goldens + load precedence."""

from archvisier_spark.kernel.config import (
    AppSettings,
    coerce_odd,
    load_settings,
    settings_from_mapping,
)


def test_coerce_odd_reference_goldens():
    # tests/test_config_validation.py:8-11 literals
    assert coerce_odd(2, 3) == 3
    assert coerce_odd(10, 11) == 11
    assert coerce_odd(1, 3) == 3
    # unparseable → default; odd passthrough
    assert coerce_odd("x", 11) == 11
    assert coerce_odd(None, 3) == 3
    assert coerce_odd(7, 3) == 7


def test_defaults_are_code_defaults():
    s = AppSettings()
    assert (s.ocr_dpi, s.ocr_psm, s.ocr_oem) == (300, 3, 3)
    assert (s.blur_kernel_size, s.adaptive_threshold_block_size,
            s.adaptive_threshold_c) == (3, 11, 2)
    assert s.ocr_language == "pol"
    assert s.ocr_workers == 0


def test_shipped_config_json_values():
    """The reference's shipped config.json overrides (5/21/5) survive
    coercion unchanged (already odd / C unconstrained)."""
    s = settings_from_mapping(
        {
            "ocr_language": "pol",
            "ocr_psm": 3,
            "ocr_oem": 3,
            "ocr_dpi": 300,
            "ocr_workers": 0,
            "blur_kernel_size": 5,
            "adaptive_threshold_block_size": 21,
            "adaptive_threshold_c": 5,
            "gui_title": "ignored",  # presentation key: dropped
        }
    )
    assert (s.blur_kernel_size, s.adaptive_threshold_block_size,
            s.adaptive_threshold_c) == (5, 21, 5)
    assert not hasattr(s, "gui_title")


def test_even_kernels_coerced_on_load():
    s = settings_from_mapping({"blur_kernel_size": 4,
                               "adaptive_threshold_block_size": 10})
    assert s.blur_kernel_size == 5
    assert s.adaptive_threshold_block_size == 11


def test_json_wins_over_env(tmp_path):
    cfg = tmp_path / "config.json"
    env = tmp_path / ".env"
    cfg.write_text('{"ocr_dpi": 150, "blur_kernel_size": 8}', encoding="utf-8")
    env.write_text("ocr_dpi=72\n# comment\nbad line\n", encoding="utf-8")
    s = load_settings(cfg, env)
    assert s.ocr_dpi == 150
    assert s.blur_kernel_size == 9

    s2 = load_settings(tmp_path / "missing.json", env)
    assert s2.ocr_dpi == 72  # env string → int

    s3 = load_settings(None, None)
    assert s3.ocr_dpi == 300
