"""Structured Streaming operators (beyond-reference capability).

The reference is batch-only (SURVEY.md §2.11); this package adds the
streaming surface a training-data pipeline needs: watermarked windowed
aggregation, session windows, and stateful streaming dedup. Every
transformation is expressed so the SAME function works on a batch
DataFrame and a streaming one — the Structured Streaming contract.
"""
