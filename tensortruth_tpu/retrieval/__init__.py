from tensortruth_tpu.retrieval.automerge import auto_merge
from tensortruth_tpu.retrieval.engine import MultiIndexEngine, RetrievedNode
from tensortruth_tpu.retrieval.metrics import RetrievalMetrics, compute_retrieval_metrics
from tensortruth_tpu.retrieval.ranking import RankingResult, RankingStage

__all__ = [
    "auto_merge",
    "MultiIndexEngine",
    "RetrievedNode",
    "RetrievalMetrics",
    "compute_retrieval_metrics",
    "RankingResult",
    "RankingStage",
]
