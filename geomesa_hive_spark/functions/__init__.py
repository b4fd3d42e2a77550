"""ST_* function surface: Arrow-vectorized pandas UDFs over the numpy
geometry kernel, mirroring the reference's SQL names
(``spatial/sql/createUDFs.sql`` + ``spatial-index/sql/createUDFs.sql``).
"""
