"""Network data models: states, flat networks, forms, sites, gates."""

from .forms import BilinearForm, QuadraticForm
from .gates import (
    gate_matrix,
    heisenberg_gate_tensor,
    pauli_transfer_matrix,
    to_tensor,
    to_tensors,
)
from .sites import (
    default_siteinds,
    op_matrix,
    op_tensor,
    site_dimension,
    site_tag,
    siteinds,
    state_vector,
)
from .tensornetwork import (
    AbstractTensorNetwork,
    TensorNetwork,
    TensorNetworkState,
    add,
    identitytensornetworkstate,
    paulitensornetworkstate,
    random_tensornetwork,
    random_tensornetworkstate,
    seed,
    tensornetworkstate,
    zerostate,
)
