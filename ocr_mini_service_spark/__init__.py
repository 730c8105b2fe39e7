"""PySpark-native main-content extraction engine.

A brand-new, Spark-first re-expression of the capabilities of the reference
OCR microservice at /root/reference (B748/ocr-mini-service): per-turn layout
extraction, baseline reading order, code-overlap pruning, and result assembly,
run as a batch(+resumable, +incremental) job over a transcripts table at
arbitrary scale.
"""

__version__ = "0.1.0"
