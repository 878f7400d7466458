from .kp_selection import (
    KPSelectionSpec,
    bestN_flow_kp,
    cell_index_table,
    local_bestN,
    opt_rigid_flow_kp,
    sampled_kp,
    sampled_kp_indices,
)
