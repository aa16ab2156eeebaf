# Driver targets for the engine (the reference's Makefile deploys AWS
# infra; this one runs the engine locally).

.PHONY: test bench bench-small demo smoke

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-small:
	SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench.py

demo:
	python examples/taxi_pipeline_demo.py

smoke:
	python -c "import __spark_entry__ as e; \
from nyc_taxi_data_pipeline_elt_spark.session import get_spark; \
df = e.entry(get_spark('smoke')); print(df.count(), 'rows'); df.show(5)"
