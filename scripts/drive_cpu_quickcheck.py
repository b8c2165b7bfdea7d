"""Drive robustbnns_tpu through its public package surface (not ./src imports)."""
import sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("ROBUSTBNNS_DATA_FALLBACK", "synthetic")

from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.models import build_architecture, train_nn, evaluate_nn

x_train, y_train, x_test, y_test, inp_shape, out_size = load_dataset("half_moons", n_inputs=3000)
print("loaded half_moons:", x_train.shape, y_train.shape, "input_shape", inp_shape)

arch = build_architecture("fc2", "leaky", inp_shape, out_size, 32)
model = train_nn(arch, x_train, y_train, epochs=5, lr=0.01, batch_size=64)
acc = evaluate_nn(model, x_test, y_test)
print("FINAL_ACC", acc)
