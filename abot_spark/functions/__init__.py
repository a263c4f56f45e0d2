"""Pure extraction kernels + their vectorized Spark UDF wrappers."""
