"""octoray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the semantics of flu-crew/octofludb (reference at
/root/reference, cited per-module as file:line) as streaming
``ray.data.Dataset`` pipelines: recognizer-based token classification,
URI minting, triple emission, entity canonicalization and the
report-layer aggregations — plus the large-scale training-data
operators (dedup families, similarity search, text analysis) the
reference never needed at its scale.

Layers (SURVEY.md §7.0):
  model       triple-table schema, URI minting, literal typing
  functions/  domain vocabularies + pure scalar functions
  recognize   vectorized token classifiers + registry + column voting
  emit        phrase -> triples (the per-record "join within row")
  stages/     map_batches / actor-pool stages (extract, scan, canon,
              textops, ann, relational, multimodal)
  sources/    readers & synthesizers (webtext pages, fasta, tables)
  pipelines/  end-to-end datasets (kg build, prep, reports)
  state/      lineage manifests + resumable checkpoints
"""

__version__ = "0.1.0"
