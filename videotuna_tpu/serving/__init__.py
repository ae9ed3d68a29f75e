from videotuna_tpu.serving.continuous import ContinuousBatchEngine

__all__ = ["ContinuousBatchEngine"]
