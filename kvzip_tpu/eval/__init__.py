from kvzip_tpu.eval.evaluator import Evaluator
from kvzip_tpu.eval.metrics import evaluate_answer

__all__ = ["Evaluator", "evaluate_answer"]
