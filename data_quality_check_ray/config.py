"""Pipeline + rule configuration.

The rule registry analog of the reference's runtime schema registry
(``data-quality-server/src/handlers.rs:27-78`` — upload a descriptor, new
message types become validatable): here, quality rules are *named, ordered
config entries*; the pipeline is assembled from this dataclass, so adding or
re-thresholding a rule is a config change, not a code change (SURVEY.md §2.9).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class RuleConfig:
    """Thresholds for the heuristic quality gates (Gopher/C4-style).

    Each threshold pairs with a drop reason ``rule:<name>``; the decision
    stage applies them in the registry order of
    ``functions.rules.DEFAULT_RULES`` (first failing rule wins — the
    reference's fail-fast ordering, dynamic-message/src/lib.rs:32-36,
    recorded instead of raised).
    """

    min_chars: int = 50
    max_chars: int = 1_000_000
    min_words: int = 10
    min_mean_word_len: float = 2.0
    max_mean_word_len: float = 12.0
    max_symbol_ratio: float = 0.1
    min_alpha_word_fraction: float = 0.7
    min_stop_fraction: float = 0.02
    max_dup2gram_fraction: float = 0.5
    max_bullet_ratio: float = 0.9
    max_ellipsis_ratio: float = 0.3
    # clean single-language docs score >=0.992, mixed-language docs <=0.971
    # (see langid_model.SCORE_TEMP) — 0.985 splits the two populations
    min_lang_score: float = 0.985
    max_ppl: float = 5000.0


@dataclass(frozen=True)
class PipelineConfig:
    rules: RuleConfig = field(default_factory=RuleConfig)
    # batch sizing: extraction sees heavy binary html rows -> smaller batches
    extract_batch_size: int = 1024
    model_batch_size: int = 2048
    # the fused model stage runs as ONE autoscaling actor pool (min, max):
    # min=1 so the pool never starves the read/write stages of CPUs on a
    # small node (the 110-permit admission analog is Ray's own streaming
    # backpressure, SURVEY.md §4.1); max is capped by available CPUs at
    # runtime.  bench.py widens this to ~the node size.
    model_concurrency: tuple[int, int] = (1, 24)
    # per-stage duration histograms (state/stage_metrics — the reference's
    # OTel histogram analog, metrics.rs:22-25): one observation per BATCH
    # per phase, aggregated by a named collector actor and snapshotted
    # into lineage rows.  Off by default: it costs one actor round-trip
    # per batch.
    stage_metrics: bool = False
    # EXPERIMENT (BENCH/dict_boundary.json): dictionary-encode
    # text_effective where it crosses the pre->model object-store
    # boundary.  Web text is near-unique per row, so the dictionary holds
    # ~every string and the indices are pure overhead — measured, not
    # assumed; kept as a flag so the negative result stays reproducible.
    dict_boundary: bool = False
    # optional JSON schema config file (schema.load_schema_file): validate
    # a different pages-table variant — e.g. extra passthrough columns —
    # without a code change (the reference's upload-a-descriptor
    # extensibility, handlers.rs:27-78, as config)
    schema_file: str | None = None


def _in_container() -> bool:
    """Container detection, same two probes as the reference settings
    crate (data-quality-settings/src/lib.rs:17-34: /.dockerenv, then
    /proc/1/cgroup mentions docker)."""
    import os

    if os.path.exists("/.dockerenv"):
        return True
    try:
        with open("/proc/1/cgroup") as f:
            return "docker" in f.read()
    except OSError:
        return False


def load_env_settings(script_path: str | None = None,
                      env=None) -> dict[str, str]:
    """``.env``-next-to-the-entry-script loading — the engine analog of
    the reference settings crate (data-quality-settings/src/lib.rs:37-84):
    inside a container it is a no-op (the orchestrator injects env, the
    docker-compose convention), otherwise ``KEY=VALUE`` lines from a
    ``.env`` beside the entry script are loaded WITHOUT overriding
    existing process env (dotenv from_filename semantics).  Returns the
    mapping actually applied.  ``#`` comments and blank lines skipped;
    surrounding single/double quotes on values stripped."""
    import os
    import sys

    env = os.environ if env is None else env
    if _in_container():
        return {}
    base = script_path or (sys.argv[0] if sys.argv and sys.argv[0] else None)
    if not base:
        return {}
    path = os.path.join(os.path.dirname(os.path.abspath(base)), ".env")
    applied: dict[str, str] = {}
    try:
        with open(path) as f:
            lines = f.readlines()
    except OSError:
        return {}
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, _, v = line.partition("=")
        k, v = k.strip(), v.strip()
        if len(v) >= 2 and v[0] == v[-1] and v[0] in "\"'":
            v = v[1:-1]
        if k and k not in env:
            env[k] = v
            applied[k] = v
    return applied


def pipeline_config_from_env(env=None) -> PipelineConfig:
    """PipelineConfig assembled from ``DQCR_*`` environment variables —
    the config-surface analog of the reference binaries reading their
    settings from the loaded env (PROTO_SCHEMA_INPUT_DIR etc.).

    Recognized: ``DQCR_RULE_<FIELD>`` for every RuleConfig field (typed
    by the dataclass), ``DQCR_EXTRACT_BATCH_SIZE``,
    ``DQCR_MODEL_BATCH_SIZE``, ``DQCR_MODEL_CONCURRENCY`` ("min,max"),
    ``DQCR_STAGE_METRICS`` (1/true), ``DQCR_SCHEMA_FILE``.  Unset keys
    keep dataclass defaults; unknown DQCR_ keys raise (typo'd threshold
    silently ignored = validation quietly misconfigured)."""
    import dataclasses
    import os

    env = os.environ if env is None else env
    rule_fields = {f.name: f for f in dataclasses.fields(RuleConfig)}
    rule_kw: dict = {}
    pipe_kw: dict = {}
    known_pipe = {
        "DQCR_EXTRACT_BATCH_SIZE": ("extract_batch_size", int),
        "DQCR_MODEL_BATCH_SIZE": ("model_batch_size", int),
        "DQCR_SCHEMA_FILE": ("schema_file", str),
    }
    for k, v in env.items():
        if not k.startswith("DQCR_"):
            continue
        if k in known_pipe:
            name, typ = known_pipe[k]
            pipe_kw[name] = typ(v)
        elif k == "DQCR_MODEL_CONCURRENCY":
            lo, hi = (int(x) for x in v.split(","))
            pipe_kw["model_concurrency"] = (lo, hi)
        elif k == "DQCR_STAGE_METRICS":
            pipe_kw["stage_metrics"] = v.strip().lower() in ("1", "true", "yes")
        elif k.startswith("DQCR_RULE_"):
            name = k[len("DQCR_RULE_"):].lower()
            if name not in rule_fields:
                raise ValueError(f"unknown rule threshold env var: {k}")
            typ = rule_fields[name].type
            caster = float if typ in ("float", float) else int
            rule_kw[name] = caster(v)
        elif k == "DQCR_NO_ORACLE_REFS":
            continue  # bench/driver switch, not pipeline config
        else:
            raise ValueError(f"unknown DQCR_ env var: {k}")
    return PipelineConfig(rules=RuleConfig(**rule_kw), **pipe_kw)
