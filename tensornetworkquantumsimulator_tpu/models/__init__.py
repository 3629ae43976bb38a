"""Network data models: states, flat networks, forms, sites, gates."""

from .channels import (
    channel_kraus,
    channel_ptm,
    imaginary_time_kraus,
    is_channel,
    kraus_to_ptm,
)
from .forms import BilinearForm, QuadraticForm
from .gates import (
    gate_matrix,
    heisenberg_gate_tensor,
    pauli_transfer_matrix,
    schrodinger_gate_tensor,
    to_tensor,
    to_tensors,
)
from .sites import (
    default_siteinds,
    op_matrix,
    op_tensor,
    pauli_coefficients,
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
    density_matrix_tensornetworkstate,
    identitytensornetworkstate,
    paulitensornetworkstate,
    random_tensornetwork,
    random_tensornetworkstate,
    seed,
    tensornetworkstate,
    zerostate,
)
