"""ML kernels (SURVEY §2.7): dense autoencoder (M3), scoring (M6),
FFT features (M7), FedAvg (M9/A5). Numpy-only — no TF/Keras in the
container; the models here are small by design (the parallelism axis at
100 TB is clients × windows, not within-model — SURVEY §7.4)."""
