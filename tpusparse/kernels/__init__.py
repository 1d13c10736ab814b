from tpusparse.kernels.gemm import gemm_pallas

__all__ = ["gemm_pallas"]
