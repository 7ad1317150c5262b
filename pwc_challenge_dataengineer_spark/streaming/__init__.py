"""Structured Streaming path: sources, shared transforms, windowed
aggregation registry, sinks, CDC. Mirrors the reference's real-time layer
(SURVEY.md §2.9/§3.3) idiomatically: Kafka/file/rate sources → from_json →
silver transform → watermarked window aggs → foreachBatch sinks."""
