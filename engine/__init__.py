"""Ray-Data-native link-graph analytics engine.

A from-scratch re-expression of the capabilities of the reference
``jkenda/ps-projekt-pagerank`` (sequential / OpenMP / OpenCL power-iteration
PageRank over SNAP edge lists — see SURVEY.md) as an idiomatic Ray Data
engine: ``ray.data.Dataset`` pipelines, zero-copy Arrow ``map_batches``,
actor pools for stateful stages, groupby-aggregate shuffles, plus the
link-graph algorithms (PageRank, connected components, label propagation,
triangle counting) and the training-data operators (dedup, similarity
search, text analysis, multimodal plumbing) mandated by BASELINE.json.

No code is copied from the reference; reference files are cited in
docstrings as ``ref: src/File.cpp:lines`` for behavioral parity only.
"""

__version__ = "0.1.0"
