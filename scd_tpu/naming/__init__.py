from scd_tpu.naming.wordnet import Taxonomy, SyntheticTaxonomy  # noqa: F401
from scd_tpu.naming.vote import (  # noqa: F401
    assign_name,
    assign_name_on_leftover,
    cluster_name_counters,
    topk_names,
)
from scd_tpu.naming.loop import (  # noqa: F401
    VotingResult,
    textual_enhancement,
    voting_loop,
    voting_loop_ptsup,
    voting_loop_te,
)
from scd_tpu.naming.zeroshot import build_zeroshot_weights  # noqa: F401
