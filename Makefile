.PHONY: test check check-small bench scaling demo

test:
	python -m pytest tests/ -x -q

check:            ## full oracle comparison at the driver's scale
	python scripts/check_correctness.py /root/testdata/sf0.01

check-small:
	python scripts/check_correctness.py /root/testdata/sf0.001

bench:
	python bench.py

scaling:
	python bench.py --scaling

demo:
	python examples/demo.py

submit:           ## cluster entrypoint (ray job submit -- python scripts/submit_flagship.py ...)
	python scripts/submit_flagship.py $(IN) $(OUT) --checkpoint-groups 64
