"""Streaming inference CLI (parity: /root/reference/rcv.py:93-114)."""

from __future__ import annotations

from pathlib import Path

import click

from ..serve.stream import StreamingServer


@click.command()
@click.option("-f", "--fifo-path", required=True,
              type=click.Path(exists=True, dir_okay=False, path_type=Path),
              help="FIFO (named pipe) carrying newline-delimited JSON frames.")
@click.option("-p", "--pack-size", type=int, required=True,
              help="Frames per sliding inference window.")
@click.option("-s", "--snapshot-path", required=True,
              type=click.Path(exists=True, dir_okay=False, path_type=Path))
@click.option("-O", "--output-csv-file", type=click.Path(dir_okay=False, path_type=Path),
              default="out.csv", show_default=True)
@click.option("--m-radius", type=float, default=25.0, show_default=True,
              help="Edge radius for online graph construction.")
@click.option("--incremental", is_flag=True, default=False,
              help="O(V²)-per-frame sliding-window graph updates instead of "
                   "a full O(V²·F) rebuild per window (same outputs).")
def main(fifo_path, pack_size, snapshot_path, output_csv_file, m_radius, incremental):
    server = StreamingServer(
        fifo_path, snapshot_path, output_csv_file, pack_size=pack_size, m_radius=m_radius,
        incremental=incremental,
    )
    server.run()
    click.echo("Bye!")


if __name__ == "__main__":
    main()
