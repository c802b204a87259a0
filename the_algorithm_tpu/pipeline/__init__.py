"""Pipeline framework: the product-mixer analog (typed, in-process)."""

from the_algorithm_tpu.pipeline.component import (  # noqa: F401
    Candidate,
    CandidatePipeline,
    CandidateSource,
    FeatureHydrator,
    Filter,
    FilterResult,
    Gate,
    QueryFeatureHydrator,
    Scorer,
    Selector,
    SideEffect,
)
from the_algorithm_tpu.pipeline.mixer import (  # noqa: F401
    EntryKind,
    Instruction,
    MixerCandidatePipeline,
    MixerPipeline,
    Module,
    Timeline,
    TimelineEntry,
)
from the_algorithm_tpu.pipeline.recommendation import (  # noqa: F401
    FailOpenPolicy,
    PipelineResult,
    QualityFactorConfig,
    RecommendationPipeline,
)
