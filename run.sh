#!/bin/bash
# Example live run (reference run.sh equivalent)
python demo.py --imagedir "$1" --calib calib/scannet.txt \
    --config config/scannet_config.yaml --output outputs/scannet_run \
    --cropborder 20 "${@:2}"
