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
