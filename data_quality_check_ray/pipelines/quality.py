"""The flagship quality-filter pipeline (SURVEY.md §3.5).

    read_parquet(pages)
      → pre    : schema cast + html→text extraction + conformance  [stateless]
      → stats  : Gopher/C4 heuristic signals                       [stateless]
      → langid : char-trigram language ID                          [actor pool]
      → ppl    : hashed-bigram LM perplexity                       [actor pool]
      → post   : PII/tox scrub + keep/drop decision + projection   [stateless]
      → write_parquet / consume

All stages are zero-copy Arrow ``map_batches``; the streaming executor
pipelines them with backpressure — nothing materializes the full dataset.
The keep/drop spine is shuffle-free by design (SURVEY.md §7.3).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from ..schema import conforming_table
from ..stages.conformance import conformance_stage
from ..stages.decide import decide_stage
from ..stages.extract import extract_stage
from ..stages.scrub import scrub_stage

#: heuristic signal columns packed into the ``quality`` struct of the output
QUALITY_SIGNALS = (
    "mean_word_len",
    "symbol_ratio",
    "alpha_word_fraction",
    "stop_fraction",
    "dup2gram_fraction",
    "bullet_ratio",
    "ellipsis_ratio",
)

#: final output column order
OUTPUT_ORDER = (
    "url",
    "warc_ts",
    "lang",
    "lang_pred",
    "lang_score",
    "ppl",
    "n_chars",
    "n_words",
    "quality",
    "pii_counts",
    "tox_count",
    "keep",
    "drop_reason",
    "text_scrubbed",
)


def pre_stage(batch: pa.Table, schema: pa.Schema | None = None) -> pa.Table:
    """Structural schema validation + extraction + row conformance.

    Composed into one map_batches body: one pass over the heavy html
    blocks, which are dropped before the batch leaves the stage.
    ``schema``: a config-loaded variant of the pages schema (extra
    passthrough columns allowed) — see ``schema.load_schema_file``."""
    batch = conforming_table(batch, schema)
    batch = extract_stage(batch)
    batch = conformance_stage(batch)
    # the raw text column is redundant once text_effective exists — drop it
    # before the batch ships to the model stage (early projection)
    return batch.drop_columns(["text"])


def make_post_stage(cfg: PipelineConfig):
    def post_stage(batch: pa.Table) -> pa.Table:
        batch = scrub_stage(batch)
        batch = decide_stage(batch, cfg.rules)
        quality = pa.StructArray.from_arrays(
            [batch[c].combine_chunks() for c in QUALITY_SIGNALS],
            names=list(QUALITY_SIGNALS),
        )
        batch = batch.append_column("quality", quality)
        return batch.select(list(OUTPUT_ORDER))

    return post_stage


def build_pipeline(ds, cfg: PipelineConfig | None = None):
    """pages Dataset -> labeled Dataset (lazy; caller consumes/writes).

    Two physical operators:
      * ``pre_stage`` as stateless tasks with small batches (heavy binary
        html rows; dropped before the batch leaves the stage);
      * ``QualityModelStage`` as ONE autoscaling actor pool holding all
        model state (langid logprobs, LM hash tables, compiled regexes)
        pinned per actor — a single pool, because chained actor pools
        create pipeline bubbles (see QualityModelStage docstring).
    """
    from ..stages.models import QualityModelStage

    cfg = cfg or PipelineConfig()
    schema = None
    if getattr(cfg, "schema_file", None):
        from ..schema import load_schema_file

        schema = load_schema_file(cfg.schema_file)  # once, on the driver

    if schema is not None:
        def pre_with_schema(batch: pa.Table) -> pa.Table:
            return pre_stage(batch, schema)

        pre_fn = pre_with_schema
    else:
        pre_fn = pre_stage
    if getattr(cfg, "dict_boundary", False):
        inner_plain = pre_fn

        def pre_dict(batch: pa.Table) -> pa.Table:
            out = inner_plain(batch)
            i = out.schema.get_field_index("text_effective")
            enc = out["text_effective"].combine_chunks().dictionary_encode()
            return out.set_column(i, "text_effective", enc)

        pre_fn = pre_dict
    if cfg.stage_metrics:
        # create the collector from the DRIVER so the driver owns it: a
        # worker-created (non-detached) actor would die with the worker
        # pool before the runner snapshots it
        from ..state.stage_metrics import get_collector

        get_collector()
        inner_pre = pre_fn

        def pre_timed(batch: pa.Table) -> pa.Table:
            import time as _time

            from ..state.stage_metrics import StageClock, get_collector

            t0 = _time.perf_counter()
            out = inner_pre(batch)
            clock = StageClock(get_collector())
            clock.observe("pre_extract_conform", _time.perf_counter() - t0)
            clock.flush()
            return out

        pre_fn = pre_timed
    ds = ds.map_batches(
        pre_fn, batch_format="pyarrow", batch_size=cfg.extract_batch_size,
        zero_copy_batch=True,
    )
    ds = ds.map_batches(
        QualityModelStage,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow", batch_size=cfg.model_batch_size,
        concurrency=cfg.model_concurrency, num_cpus=1, zero_copy_batch=True,
    )
    return ds
