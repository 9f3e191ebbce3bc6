"""FedAvg rounds as micro-batches (SURVEY §2.9: "rounds = micro-batches;
foreachBatch + driver state").

The reference's blocking accept/receive aggregator loop
(aggregation.py:91-102) and staggered client sleeps (training.py:71-76)
become: each arriving micro-batch of training windows runs one
clients-as-groups local-training round, the driver folds the averaged
weights into its state, and the next batch trains from them. Restart
semantics come from the sink checkpoint; weights themselves should be
checkpointed per round by the caller if needed (tiny: KBs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..ml.autoencoder import Weights, init_weights
from ..ml.fedavg import fedavg_round, rows_to_weights


class StreamingFedAvg:
    """foreachBatch callback object holding the round state."""

    def __init__(
        self,
        sizes: list[int],
        client_col: str = "client_id",
        epochs_per_batch: int = 1,
        lr: float = 1e-3,
        seed: int = 7,
    ) -> None:
        self.sizes = sizes
        self.client_col = client_col
        self.epochs = epochs_per_batch
        self.lr = lr
        self.weights: Weights = init_weights(sizes, seed=seed)
        self.rounds_run = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        averaged = fedavg_round(
            batch_df,
            self.weights,
            client_col=self.client_col,
            epochs=self.epochs,
            lr=self.lr,
        )
        self.weights = rows_to_weights(averaged.collect(), self.sizes)
        self.rounds_run += 1


def run_streaming_fedavg(
    windows_stream: DataFrame,
    sizes: list[int],
    checkpoint_dir: str,
    **kwargs,
) -> StreamingFedAvg:
    """Start (and drain, availableNow) a federated trainer over a stream
    of window rows. Returns the callback holding the final weights."""
    trainer = StreamingFedAvg(sizes, **kwargs)
    q = (
        windows_stream.writeStream.foreachBatch(trainer)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return trainer
