"""TensorBoard scalar logging.

Parity target: reference ``fcos_core/utils/metric_logger.py:71-106``
(``TensorboardLogger`` via tensorboardX, enabled by --use_tensorboard).
Uses tf.summary when TensorFlow is importable; no-ops otherwise.
"""

import logging

logger = logging.getLogger("scan_tpu.tb")


class TensorboardLogger:
    def __init__(self, log_dir: str):
        self._writer = None
        try:
            import tensorflow as tf

            self._tf = tf
            self._writer = tf.summary.create_file_writer(log_dir)
            logger.info("tensorboard logs -> %s", log_dir)
        except Exception as e:  # pragma: no cover
            logger.warning("tensorboard unavailable: %s", e)

    def log_scalars(self, scalars: dict, step: int):
        """Same scalar set as the reference's TensorboardLogger.update
        (metric_logger.py:93-106: every loss term + time/data each window)."""
        if self._writer is None:
            return
        with self._writer.as_default():
            for k, v in scalars.items():
                self._tf.summary.scalar(k, float(v), step=step)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()
