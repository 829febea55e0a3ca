from s2p_tpu.testing.csv_util import get_exp, check_equal, check_exactly_equal
from s2p_tpu.testing.stubs import StubPolicy, AddEs
from s2p_tpu.testing.debug_util import save_tensor, load_tensor, TensorTrace

__all__ = [
    "get_exp", "check_equal", "check_exactly_equal",
    "StubPolicy", "AddEs",
    "save_tensor", "load_tensor", "TensorTrace",
]
