module gamma-tpu/go

go 1.20
