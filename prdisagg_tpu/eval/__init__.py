from prdisagg_tpu.eval.evaluate import Evaluator

__all__ = ["Evaluator"]
