"""Run loggers — rebuild of reference cogdl/loggers/ (build_logger:4, no-op
base, TensorBoard, Weights&Biases)."""

from __future__ import annotations

from typing import Dict, Optional


class Logger:
    def __init__(self, log_path: str = "."):
        self.log_path = log_path

    def start(self):
        pass

    def note(self, metrics: Dict[str, float], step: int):
        pass

    def finish(self):
        pass


class PrintLogger(Logger):
    def __init__(self, log_path: str = ".", every: int = 20):
        super().__init__(log_path)
        self.every = every

    def note(self, metrics, step):
        if step % self.every == 0:
            parts = " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
            print(f"[{step}] {parts}")


class TBLogger(Logger):
    """TensorBoard event files via flax's metric writer when available."""

    def __init__(self, log_path: str = "./runs"):
        super().__init__(log_path)
        self._writer = None

    def start(self):
        try:
            from flax.metrics import tensorboard

            self._writer = tensorboard.SummaryWriter(self.log_path)
        except Exception:
            self._writer = None

    def note(self, metrics, step):
        if self._writer is None:
            self.start()
        if self._writer is not None:
            for k, v in metrics.items():
                self._writer.scalar(k, v, step)

    def finish(self):
        if self._writer is not None:
            self._writer.flush()


class WandbLogger(Logger):
    def __init__(self, log_path: str = ".", project: str = "cogdl_tpu"):
        super().__init__(log_path)
        self.project = project
        self._run = None

    def start(self):
        try:
            import wandb

            self._run = wandb.init(project=self.project, dir=self.log_path)
        except Exception:
            self._run = None

    def note(self, metrics, step):
        if self._run is not None:
            self._run.log(metrics, step=step)

    def finish(self):
        if self._run is not None:
            self._run.finish()


def build_logger(logger: Optional[str] = None, log_path: str = ".",
                 project: str = "cogdl_tpu") -> Logger:
    if logger in (None, "none"):
        return Logger(log_path)
    if logger == "print":
        return PrintLogger(log_path)
    if logger == "tensorboard":
        return TBLogger(log_path)
    if logger == "wandb":
        return WandbLogger(log_path, project)
    raise ValueError(f"unknown logger {logger!r}")
