"""Column-expression builders (JVM-side; whole-stage codegen; zero Python in
the hot path). Where the math is SQL-expressible we prefer these over the
numpy kernels — the kernels remain the golden source of truth in tests."""
