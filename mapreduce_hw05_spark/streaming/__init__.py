"""Structured Streaming variants of the stateful operators (SURVEY §2.9).

Correctness contract: each op's batch analog (plans/events_queries.py);
the tests replay the events fixture as a file stream in controlled
micro-batches and assert the streaming result equals the batch result
(unified-semantics check), plus dedicated watermark/late-data behavior.
"""
