-- Demonstration model file in the reference's models.sql convention:
-- blocks selected by `-- ClassName: key` headers, `{{ name }}` table
-- aliases, `$param` named parameters, multi-statement scripts.
-- (reference convention: README.md:100-116; parsed per common/models.py:46-64)

-- SalesByPriority: create
CREATE OR REPLACE TEMP VIEW {{ scoped_orders }} AS
SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice, o_orderdate
FROM {{ orders }}

-- SalesByPriority: select
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM {{ scoped_orders }}
WHERE o_totalprice >= $min_total
GROUP BY o_orderpriority

-- InsertBatch: bulk_insert
CREATE OR REPLACE TEMP VIEW {{ staged }} AS
SELECT * FROM batch_rows;
SELECT COUNT(*) AS n FROM {{ staged }}
