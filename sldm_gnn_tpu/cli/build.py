"""Offline graph-construction CLI (parity: /root/reference/build.py)."""

from __future__ import annotations

from pathlib import Path

import click

from ..build.map_builder import MapBuilder
from ..build.vehicle import GraphsBuilder

DEF_FNUM = 100
DEF_RADIUS = 30.0
DEF_MAP_LAT_CONN_MAX_ANGLE = 30.0
DEF_MAP_LAT_CONN_PROXIMITY_THRESHOLD = 1.0


@click.command()
@click.argument("data_path", type=click.Path(exists=True, file_okay=False, path_type=Path))
@click.option("-r", "--radius-threshold", type=float, default=DEF_RADIUS, show_default=True,
              help="Trajectory-proximity radius for vehicle-graph edges.")
@click.option("-l", "--active-label", type=int, required=True,
              help="Active label index to encode in graph labels.")
@click.option("-f", "--frames-num", type=int, default=DEF_FNUM, show_default=True,
              help="Frames per pack window.")
@click.option("--map-only", is_flag=True, default=False, help="Only build the map graph.")
@click.option("--map.lat-conn.max-angle", "map_lat_conn_max_angle", type=float,
              default=DEF_MAP_LAT_CONN_MAX_ANGLE, show_default=True)
@click.option("--map.lat-conn.proximity-threshold", "map_lat_conn_proximity_threshold", type=float,
              default=DEF_MAP_LAT_CONN_PROXIMITY_THRESHOLD, show_default=True)
@click.option("-T", "--workers", "n_workers", type=int, default=1, show_default=True,
              help="Parallel worker processes for the pack ETL.")
def main(data_path, radius_threshold, active_label, frames_num, map_only,
         map_lat_conn_max_angle, map_lat_conn_proximity_threshold, n_workers):
    dp = data_path.resolve()

    click.echo("Building common map...")
    MapBuilder(
        dp / "vmap.parquet",
        lat_conn_max_angle_deg=map_lat_conn_max_angle,
        lat_conn_proximity_threshold=map_lat_conn_proximity_threshold,
    ).save()
    if map_only:
        return

    for split in ("train", "eval", "test"):
        sdir = dp / split
        if not sdir.is_dir():
            if split == "test":
                continue
            raise click.ClickException(f"missing split directory: {sdir}")
        click.echo(f"Building {split} split graphs...")
        GraphsBuilder(
            sdir,
            frames_num=frames_num,
            m_radius=radius_threshold,
            active_labels=[active_label],
            n_workers=n_workers,
        ).save(progress=True)


if __name__ == "__main__":
    main()
