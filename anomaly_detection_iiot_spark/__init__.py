"""anomaly_detection_iiot_spark — a PySpark-native analytics engine.

Re-expresses the data-processing capabilities of the reference repo
OliverStoll/Anomaly-Detection-IIoT (an autoencoder-based IIoT anomaly
detection pipeline, pandas/numpy/TF) as an idiomatic Spark engine:

- ``sources``   — ingestion (TSV snapshot dirs, KBM CSV, JSON logs)
- ``operators`` — relational / time-series operator library
- ``functions`` — scalar/array helper expressions
- ``ml``        — autoencoder kernels, FFT, scoring, FedAvg
- ``streaming`` — Structured Streaming variants
- ``queries``   — named, oracle-checked query registry (driver contract)
- ``plans``     — composed end-to-end pipelines (flagship entry)

Everything is DataFrame-first: logical plans are declared via the
DataFrame/SQL API so Catalyst handles pushdown, pruning and join
strategy; Python only runs inside Arrow-vectorized pandas UDFs for the
genuinely non-relational kernels (FFT, model forward passes).
"""

__version__ = "0.1.0"
