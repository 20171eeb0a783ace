from ku.metrics_ext.metrics import MeanIoUExt
