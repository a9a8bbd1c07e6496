"""Command-line entry points.

Usage (mirrors the reference's script surface, SURVEY.md §1 L7):

    python -m sldm_gnn_tpu.cli.build DATA_DIR -l 2 [...]
    python -m sldm_gnn_tpu.cli.train INPUTDIR OUTDIR -l 2 [--include-map] [...]
    python -m sldm_gnn_tpu.cli.test INPUTDIR OUTDIR -w snapshot.pkl [...]
    python -m sldm_gnn_tpu.cli.rcv -f FIFO -p PACK_SIZE -s snapshot.pkl -O out.csv
    python -m sldm_gnn_tpu.cli.compare --gt-parquet ... --pred-csv ...
"""
