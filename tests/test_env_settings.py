"""Env-file + DQCR_* settings loading (config.load_env_settings /
pipeline_config_from_env — the reference settings-crate analog,
data-quality-settings/src/lib.rs:16-90)."""

from __future__ import annotations

import pytest

from data_quality_check_ray import config as cfgmod
from data_quality_check_ray.config import (
    PipelineConfig,
    load_env_settings,
    pipeline_config_from_env,
)


def test_env_file_loaded_without_overriding_process_env(tmp_path,
                                                        monkeypatch):
    script = tmp_path / "entry.py"
    script.write_text("")
    (tmp_path / ".env").write_text(
        "# comment line\n"
        "\n"
        "DQCR_RULE_MIN_WORDS=25\n"
        "ALREADY_SET=from_file\n"
        'QUOTED="hello world"\n'
        "malformed line without equals is skipped? no, has none\n"
    )
    monkeypatch.setattr(cfgmod, "_in_container", lambda: False)
    env = {"ALREADY_SET": "from_process"}
    applied = load_env_settings(str(script), env=env)
    assert applied == {"DQCR_RULE_MIN_WORDS": "25",
                       "QUOTED": "hello world"}
    assert env["ALREADY_SET"] == "from_process"  # process env wins
    assert env["DQCR_RULE_MIN_WORDS"] == "25"


def test_env_file_skipped_in_container(tmp_path, monkeypatch):
    script = tmp_path / "entry.py"
    script.write_text("")
    (tmp_path / ".env").write_text("X=1\n")
    monkeypatch.setattr(cfgmod, "_in_container", lambda: True)
    assert load_env_settings(str(script), env={}) == {}


def test_missing_env_file_is_noop(tmp_path, monkeypatch):
    monkeypatch.setattr(cfgmod, "_in_container", lambda: False)
    env: dict = {}
    assert load_env_settings(str(tmp_path / "entry.py"), env=env) == {}
    assert env == {}


def test_pipeline_config_from_env_typed_mapping():
    env = {
        "DQCR_RULE_MIN_WORDS": "25",
        "DQCR_RULE_MAX_SYMBOL_RATIO": "0.25",
        "DQCR_MODEL_BATCH_SIZE": "4096",
        "DQCR_MODEL_CONCURRENCY": "2,6",
        "DQCR_STAGE_METRICS": "true",
        "UNRELATED": "ignored",
        "DQCR_NO_ORACLE_REFS": "1",  # bench switch, not config
    }
    c = pipeline_config_from_env(env)
    assert c.rules.min_words == 25
    assert c.rules.max_symbol_ratio == 0.25
    assert c.model_batch_size == 4096
    assert c.model_concurrency == (2, 6)
    assert c.stage_metrics is True
    # untouched fields keep dataclass defaults
    assert c.rules.min_chars == PipelineConfig().rules.min_chars


def test_unknown_dqcr_var_raises():
    with pytest.raises(ValueError, match="DQCR_RULE_MIN_WRODS"):
        pipeline_config_from_env({"DQCR_RULE_MIN_WRODS": "5"})
    with pytest.raises(ValueError, match="DQCR_BOGUS"):
        pipeline_config_from_env({"DQCR_BOGUS": "1"})


def test_env_config_flows_into_cli(tmp_path, monkeypatch,
                                   quiet_data_context):
    """DQCR_RULE_MIN_WORDS via env changes the CLI run's labels —
    config surface proven end-to-end (reference: binaries read their
    settings from the loaded env)."""
    import glob

    import pyarrow.parquet as pq

    from data_quality_check_ray.run import main
    from data_quality_check_ray.sources import synth

    pages = tmp_path / "pages"
    synth.write_pages_parquet(str(pages), 300, num_files=1)

    def run_with(env_min_words, out_name):
        if env_min_words is None:
            monkeypatch.delenv("DQCR_RULE_MIN_WORDS", raising=False)
        else:
            monkeypatch.setenv("DQCR_RULE_MIN_WORDS", str(env_min_words))
        out = tmp_path / out_name
        assert main(["--input", str(pages), "--output", str(out)]) == 0
        files = sorted(glob.glob(str(out / "part-*" / "*.parquet")))
        import pyarrow as pa

        t = pa.concat_tables(pq.read_table(f, columns=["drop_reason"])
                             for f in files)
        return (t.to_pandas()["drop_reason"] == "rule:too_few_words").sum()

    base = run_with(None, "out_default")
    strict = run_with(10_000, "out_strict")  # everything is too short
    assert strict > base
    assert strict >= 250  # all non-conform rows


def test_rule_threshold_rejects_non_numeric():
    with pytest.raises(ValueError):
        pipeline_config_from_env({"DQCR_RULE_MIN_WORDS": "ten"})
