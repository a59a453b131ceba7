"""data_quality_check_ray — a Ray-Data-native web-text quality engine.

A from-scratch re-expression of the semantics of the reference repo
``digitaldanieldev/data-quality-check`` (per-record validate-against-schema,
field predicates, dynamic rule registry, per-dimension metrics — see SURVEY.md)
as a partition-parallel, zero-copy-Arrow streaming pipeline over
``ray.data.Dataset``:

    read_parquet(pages)
      → map_batches(conformance)        # schema validation as a batch predicate
      → map_batches(extract)            # html -> text, byte-deterministic
      → map_batches(heuristics)         # Gopher/C4 rules, pure pyarrow.compute
      → map_batches(LangIdModel, ...)   # actor pool, model pinned per actor
      → map_batches(PerplexityModel, ...)
      → map_batches(pii_scrub)          # precompiled RE2 bank
      → map_batches(decide)             # keep/drop + first-failing reason
      → write_parquet(out, per-partition) + lineage/metrics rows

Nothing from the reference's Rust/axum/tokio execution model is carried over;
only its decision semantics (strict conformance => drop, field predicates,
registry-driven extensibility) are preserved, recast columnar.
"""

__version__ = "0.1.0"
