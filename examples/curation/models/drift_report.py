# IVF index drift monitoring as a MODEL: per centroid cell, how the
# arriving slice's assignment load and cosine fit compare to the frozen
# training slice -- the table an analyst watches to decide when the ANN
# index needs retraining. The heavy lifting (k-means training, integer
# cosine scoring) lives in the engine's operator library; graft_op
# routes this model's declared input into it, the same way dbt python
# models hand their inputs to external compute.
def model(dbt, session):
    dbt.config(materialized="table", graft_op="sim_index_drift")
    return dbt.source("raw", "embeddings")
