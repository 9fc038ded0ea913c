"""Engine-extension operators (SURVEY.md §2.11): dedup, similarity search,
text analysis, multimodal column plumbing — the LLM-data-pipeline surface
layered on the same DataFrame discipline as the relational core."""

from . import dedup, multimodal, similarity, skew, temporal, text  # noqa: F401
