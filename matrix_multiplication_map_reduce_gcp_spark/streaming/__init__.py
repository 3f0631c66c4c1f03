"""Structured Streaming operators over the `events` table: tumbling /
sliding / session windows, watermarks, streaming dedup (SURVEY.md §2.3
"Streaming" row — absent from the reference entirely).

Test strategy (SURVEY.md §7-7): run each streaming query to completion
with trigger(availableNow=True) into a memory sink and compare against
a batch oracle — streaming results must be batch-equivalent.
"""
