"""PySpark-native analytics engine with the query surface of the reference
``sktzwhj/MapReduce_SSSP`` (Hadoop MR SSSP + graph reversal), extended with
the relational and LLM-data-pipeline operator set described in SURVEY.md §7.

Everything is DataFrame/SQL-first: logical plans are declared with the
PySpark DataFrame API and Catalyst/Tungsten pick the physical strategy.
The only imperative control flow is the driver-side SSSP fixpoint loop
(reference SingleSourceSP.java:439-519), re-expressed as a DataFrame loop
with checkpoint-based lineage truncation.
"""

__version__ = "0.1.0"
