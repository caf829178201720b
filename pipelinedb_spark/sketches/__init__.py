"""Mergeable sketch aggregates (t-digest, count-min, space-saving top-k,
bloom) as pandas-UDAF-backed combinable aggregates.  Populated by the
submodules; ``register_all`` attaches them to an AggRegistry."""

from __future__ import annotations


def register_all(registry) -> None:
    from pipelinedb_spark.sketches import registration

    registration.register_all(registry)
