"""Structured Streaming surface (SURVEY.md §2.9).

The reference has no streaming; its only stream-shaped piece is the
one-pass mergeable StreamingHistogram sketch (Gddp.scala:230). This
package provides the real thing over the ``events`` table: event-time
windows + watermarks, session windows, within-watermark dedup, and a
custom stateful operator — all as **source-agnostic transformations**
(`ops`) that run identically on a batch DataFrame and a readStream
DataFrame, which is what makes batch-equivalence testable
(tests/test_streaming.py) and is the idiomatic Spark design: the
logical plan is the contract, the source decides micro-batching.
"""
