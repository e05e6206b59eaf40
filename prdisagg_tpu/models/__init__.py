from prdisagg_tpu.models.generator import Generator
from prdisagg_tpu.models.critic import Critic

__all__ = ["Generator", "Critic"]
