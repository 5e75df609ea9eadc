"""Column-expression library (pure, narrow, codegen-friendly).

Everything here returns pyspark Columns built from pyspark.sql.functions —
JVM-side, whole-stage-codegen'd, shuffle-free. Python executes only at plan
construction time.
"""
