## kevlar-tpu development targets (parity with the reference's Makefile)

test:
	python -m pytest tests/ -q -m 'not slow'

testall:
	python -m pytest tests/ -q

testfast:
	python -m pytest tests/ -q -x -m 'not slow'

native:
	python -m kevlar_tpu.native.build

bench:
	python bench.py

bench-call:
	python bench_call.py

golden:
	python -m tests.test_golden

.PHONY: test testall testfast native bench bench-call golden
