from africanus_tpu.ops.cplx import Cplx, cplx, expi, cmatmul, to_numpy

__all__ = ["Cplx", "cplx", "expi", "cmatmul", "to_numpy"]
