// constantine_tpu protocol C ABI — embedded-CPython shim.
//
// The TPU compute path lives in the Python/JAX framework; this shim gives
// C/Rust/Go callers the same protocol entry points the reference exports
// from its static/shared library (bindings/c_curve_decls.nim,
// include/constantine/protocols/*.h). Design: one embedded interpreter
// (initialized lazily, held for the process lifetime), one cached module
// handle per protocol module, GIL-scoped calls. This mirrors how the
// reference's C API wraps its Nim runtime — the runtime just happens to
// carry a JAX device context here.
//
// Build: make -C native protocols   (links -lpython3.12)

#include "../include/constantine_tpu_protocols.h"

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <cstring>
#include <mutex>
#include <string>

namespace {

std::once_flag g_init_once;

void ensure_python() {
  std::call_once(g_init_once, [] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
      // release the GIL acquired by initialization
      PyEval_SaveThread();
    }
  });
}

struct Gil {
  PyGILState_STATE st;
  Gil() { st = PyGILState_Ensure(); }
  ~Gil() { PyGILState_Release(st); }
};

PyObject* get_attr(const char* module, const char* fn) {
  PyObject* mod = PyImport_ImportModule(module);
  if (!mod) { PyErr_Print(); return nullptr; }
  PyObject* f = PyObject_GetAttrString(mod, fn);
  Py_DECREF(mod);
  if (!f) PyErr_Print();
  return f;
}

// Call models.eip4844.<fn>(*bytes_args) -> PyObject* (new ref) or nullptr
PyObject* call_bytes(const char* module, const char* fn,
                     std::initializer_list<std::pair<const byte*, size_t>>
                         args) {
  PyObject* f = get_attr(module, fn);
  if (!f) return nullptr;
  PyObject* tup = PyTuple_New((Py_ssize_t)args.size());
  Py_ssize_t i = 0;
  for (auto& a : args) {
    PyTuple_SET_ITEM(tup, i++, PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(a.first), (Py_ssize_t)a.second));
  }
  PyObject* res = PyObject_CallObject(f, tup);
  Py_DECREF(tup);
  Py_DECREF(f);
  if (!res) PyErr_Print();
  return res;
}

ctt_eth_kzg_status copy_bytes_out(PyObject* res, byte* dst, size_t n) {
  if (!res) return cttEthKzg_RuntimeError;
  if (res == Py_None) { Py_DECREF(res); return cttEthKzg_EccInvalidEncoding; }
  char* buf; Py_ssize_t len;
  if (PyBytes_AsStringAndSize(res, &buf, &len) != 0 || (size_t)len != n) {
    Py_XDECREF(res);
    return cttEthKzg_RuntimeError;
  }
  std::memcpy(dst, buf, n);
  Py_DECREF(res);
  return cttEthKzg_Success;
}

}  // namespace

extern "C" {

// The context handle wraps nothing: the Python side holds the (cached)
// trusted setup singleton; the pointer is an opaque liveness token.
struct ctt_eth_kzg_context_struct { int token; };

ctt_eth_kzg_context* ctt_eth_trusted_setup_load(const char* filepath) {
  ensure_python();
  Gil gil;
  PyObject* f = get_attr("constantine_tpu.capi",
                         "load_trusted_setup");
  if (!f) return nullptr;
  PyObject* res = filepath && filepath[0]
      ? PyObject_CallFunction(f, "s", filepath)
      : PyObject_CallNoArgs(f);
  Py_DECREF(f);
  if (!res) { PyErr_Print(); return nullptr; }
  Py_DECREF(res);
  return new ctt_eth_kzg_context_struct{1};
}

void ctt_eth_trusted_setup_delete(ctt_eth_kzg_context* ctx) { delete ctx; }

ctt_eth_kzg_status ctt_eth_kzg_blob_to_kzg_commitment(
    const ctt_eth_kzg_context*, ctt_eth_kzg_commitment* dst,
    const ctt_eth_kzg_blob* blob) {
  ensure_python();
  Gil gil;
  PyObject* res = call_bytes("constantine_tpu.capi",
                             "blob_to_kzg_commitment",
                             {{blob->raw, sizeof(blob->raw)}});
  return copy_bytes_out(res, dst->raw, 48);
}

ctt_eth_kzg_status ctt_eth_kzg_compute_kzg_proof(
    const ctt_eth_kzg_context*, ctt_eth_kzg_proof* proof,
    ctt_eth_kzg_eval_at_challenge* y, const ctt_eth_kzg_blob* blob,
    const ctt_eth_kzg_opening_challenge* z) {
  ensure_python();
  Gil gil;
  PyObject* res = call_bytes("constantine_tpu.capi",
                             "compute_kzg_proof",
                             {{blob->raw, sizeof(blob->raw)}, {z->raw, 32}});
  if (!res) return cttEthKzg_RuntimeError;
  if (res == Py_None) { Py_DECREF(res); return cttEthKzg_EccInvalidEncoding; }
  // (proof_bytes, y_bytes)
  if (!PyTuple_Check(res) || PyTuple_GET_SIZE(res) != 2) {
    Py_DECREF(res); return cttEthKzg_RuntimeError;
  }
  PyObject* p0 = PyTuple_GET_ITEM(res, 0);
  PyObject* p1 = PyTuple_GET_ITEM(res, 1);
  char* b; Py_ssize_t l;
  if (PyBytes_AsStringAndSize(p0, &b, &l) || l != 48) {
    Py_DECREF(res); return cttEthKzg_RuntimeError;
  }
  std::memcpy(proof->raw, b, 48);
  if (PyBytes_AsStringAndSize(p1, &b, &l) || l != 32) {
    Py_DECREF(res); return cttEthKzg_RuntimeError;
  }
  std::memcpy(y->raw, b, 32);
  Py_DECREF(res);
  return cttEthKzg_Success;
}

static ctt_eth_kzg_status bool_status(PyObject* res) {
  if (!res) return cttEthKzg_RuntimeError;
  if (res == Py_None) { Py_DECREF(res); return cttEthKzg_EccInvalidEncoding; }
  int truth = PyObject_IsTrue(res);
  Py_DECREF(res);
  if (truth < 0) return cttEthKzg_RuntimeError;
  return truth ? cttEthKzg_Success : cttEthKzg_VerificationFailure;
}

ctt_eth_kzg_status ctt_eth_kzg_verify_kzg_proof(
    const ctt_eth_kzg_context*, const ctt_eth_kzg_commitment* commitment,
    const ctt_eth_kzg_opening_challenge* z,
    const ctt_eth_kzg_eval_at_challenge* y, const ctt_eth_kzg_proof* proof) {
  ensure_python();
  Gil gil;
  PyObject* res = call_bytes("constantine_tpu.capi",
                             "verify_kzg_proof",
                             {{commitment->raw, 48}, {z->raw, 32},
                              {y->raw, 32}, {proof->raw, 48}});
  return bool_status(res);
}

ctt_eth_kzg_status ctt_eth_kzg_compute_blob_kzg_proof(
    const ctt_eth_kzg_context*, ctt_eth_kzg_proof* proof,
    const ctt_eth_kzg_blob* blob, const ctt_eth_kzg_commitment* commitment) {
  ensure_python();
  Gil gil;
  PyObject* res = call_bytes("constantine_tpu.capi",
                             "compute_blob_kzg_proof",
                             {{blob->raw, sizeof(blob->raw)},
                              {commitment->raw, 48}});
  return copy_bytes_out(res, proof->raw, 48);
}

ctt_eth_kzg_status ctt_eth_kzg_verify_blob_kzg_proof(
    const ctt_eth_kzg_context*, const ctt_eth_kzg_blob* blob,
    const ctt_eth_kzg_commitment* commitment, const ctt_eth_kzg_proof* proof) {
  ensure_python();
  Gil gil;
  PyObject* res = call_bytes("constantine_tpu.capi",
                             "verify_blob_kzg_proof",
                             {{blob->raw, sizeof(blob->raw)},
                              {commitment->raw, 48}, {proof->raw, 48}});
  return bool_status(res);
}

ctt_eth_kzg_status ctt_eth_kzg_verify_blob_kzg_proof_batch(
    const ctt_eth_kzg_context*, const ctt_eth_kzg_blob* blobs,
    const ctt_eth_kzg_commitment* commitments, const ctt_eth_kzg_proof* proofs,
    size_t n, const byte secure_random_bytes[32]) {
  ensure_python();
  Gil gil;
  PyObject* f = get_attr("constantine_tpu.capi",
                         "verify_blob_kzg_proof_batch");
  if (!f) return cttEthKzg_RuntimeError;
  PyObject* lb = PyList_New((Py_ssize_t)n);
  PyObject* lc = PyList_New((Py_ssize_t)n);
  PyObject* lp = PyList_New((Py_ssize_t)n);
  for (size_t i = 0; i < n; i++) {
    PyList_SET_ITEM(lb, (Py_ssize_t)i, PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(blobs[i].raw), 4096 * 32));
    PyList_SET_ITEM(lc, (Py_ssize_t)i, PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(commitments[i].raw), 48));
    PyList_SET_ITEM(lp, (Py_ssize_t)i, PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(proofs[i].raw), 48));
  }
  PyObject* rnd = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(secure_random_bytes), 32);
  PyObject* res = PyObject_CallFunctionObjArgs(f, lb, lc, lp, rnd, nullptr);
  Py_DECREF(f); Py_DECREF(lb); Py_DECREF(lc); Py_DECREF(lp); Py_DECREF(rnd);
  if (!res) PyErr_Print();
  return bool_status(res);
}

// ---------------------------------------------------------------------
// BLS signatures
// ---------------------------------------------------------------------

static ctt_eth_bls_status bls_bool(PyObject* res) {
  if (!res) return cttEthBls_RuntimeError;
  if (res == Py_None) { Py_DECREF(res); return cttEthBls_EccInvalidEncoding; }
  int truth = PyObject_IsTrue(res);
  Py_DECREF(res);
  if (truth < 0) return cttEthBls_RuntimeError;
  return truth ? cttEthBls_Success : cttEthBls_VerificationFailure;
}

ctt_eth_bls_status ctt_eth_bls_verify(
    const ctt_eth_bls_pubkey* pubkey, const byte* message,
    size_t message_len, const ctt_eth_bls_signature* signature) {
  ensure_python();
  Gil gil;
  PyObject* res = call_bytes("constantine_tpu.capi",
                             "bls_verify",
                             {{pubkey->raw, 48}, {message, message_len},
                              {signature->raw, 96}});
  return bls_bool(res);
}

ctt_eth_bls_status ctt_eth_bls_batch_verify(
    const ctt_eth_bls_pubkey* pubkeys, const byte* const* messages,
    const size_t* message_lens, const ctt_eth_bls_signature* signatures,
    size_t n, const byte secure_random_bytes[32]) {
  ensure_python();
  Gil gil;
  PyObject* f = get_attr("constantine_tpu.capi",
                         "bls_batch_verify");
  if (!f) return cttEthBls_RuntimeError;
  PyObject* lk = PyList_New((Py_ssize_t)n);
  PyObject* lm = PyList_New((Py_ssize_t)n);
  PyObject* ls = PyList_New((Py_ssize_t)n);
  for (size_t i = 0; i < n; i++) {
    PyList_SET_ITEM(lk, (Py_ssize_t)i, PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(pubkeys[i].raw), 48));
    PyList_SET_ITEM(lm, (Py_ssize_t)i, PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(messages[i]),
        (Py_ssize_t)message_lens[i]));
    PyList_SET_ITEM(ls, (Py_ssize_t)i, PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(signatures[i].raw), 96));
  }
  PyObject* rnd = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(secure_random_bytes), 32);
  PyObject* res = PyObject_CallFunctionObjArgs(f, lk, lm, ls, rnd, nullptr);
  Py_DECREF(f); Py_DECREF(lk); Py_DECREF(lm); Py_DECREF(ls); Py_DECREF(rnd);
  if (!res) PyErr_Print();
  return bls_bool(res);
}

// ---------------------------------------------------------------------
// Hash-to-curve + MODEXP
// ---------------------------------------------------------------------

int ctt_bls12381_g2_hash_to_curve(byte out[96], const byte* message,
                                  size_t message_len, const byte* dst,
                                  size_t dst_len) {
  ensure_python();
  Gil gil;
  PyObject* res = call_bytes("constantine_tpu.capi",
                             "hash_to_g2_compressed",
                             {{message, message_len}, {dst, dst_len}});
  return copy_bytes_out(res, out, 96) == cttEthKzg_Success ? 0 : 1;
}

int ctt_eth_evm_modexp(byte* out, size_t out_len, const byte* calldata,
                       size_t calldata_len) {
  ensure_python();
  Gil gil;
  PyObject* res = call_bytes("constantine_tpu.capi",
                             "eth_evm_modexp", {{calldata, calldata_len}});
  if (!res) return 1;
  if (res == Py_None) { Py_DECREF(res); return 1; }
  char* b; Py_ssize_t l;
  if (PyBytes_AsStringAndSize(res, &b, &l) || (size_t)l > out_len) {
    Py_XDECREF(res); return 1;
  }
  std::memset(out, 0, out_len);
  std::memcpy(out + (out_len - (size_t)l), b, (size_t)l);
  Py_DECREF(res);
  return 0;
}


// ---------------------------------------------------------------------
// EVM precompiles — fixed-size byte-in/byte-out via capi.eth_evm_precompile
// ---------------------------------------------------------------------

static int evm_call(const char* name, byte* out, size_t out_len,
                    const byte* in, size_t len) {
  ensure_python();
  Gil gil;
  PyObject* f = get_attr("constantine_tpu.capi", "eth_evm_precompile");
  if (!f) return 1;
  PyObject* res = PyObject_CallFunction(
      f, "sy#", name, reinterpret_cast<const char*>(in), (Py_ssize_t)len);
  Py_DECREF(f);
  if (!res) { PyErr_Print(); return 1; }
  if (res == Py_None) { Py_DECREF(res); return 1; }
  char* b; Py_ssize_t l;
  if (PyBytes_AsStringAndSize(res, &b, &l) || (size_t)l != out_len) {
    Py_XDECREF(res); return 1;
  }
  std::memcpy(out, b, out_len);
  Py_DECREF(res);
  return 0;
}

#define CTT_EVM(name, sz) \
  int ctt_eth_evm_##name(byte out[sz], const byte* in, size_t len) { \
    return evm_call(#name, out, sz, in, len); \
  }

CTT_EVM(sha256, 32)
CTT_EVM(ripemd160, 32)
CTT_EVM(bn254_g1add, 64)
CTT_EVM(bn254_g1mul, 64)
CTT_EVM(bn254_ecpairingcheck, 32)
CTT_EVM(bls12381_g1add, 128)
CTT_EVM(bls12381_g1msm, 128)
CTT_EVM(bls12381_g2add, 256)
CTT_EVM(bls12381_g2msm, 256)
CTT_EVM(bls12381_pairingcheck, 32)
CTT_EVM(bls12381_map_fp_to_g1, 128)
CTT_EVM(bls12381_map_fp2_to_g2, 256)

int ctt_bls12381_g1_msm(byte out[96], const byte* points,
                        const byte* scalars, size_t n) {
  ensure_python();
  Gil gil;
  PyObject* res = call_bytes("constantine_tpu.capi",
                             "bls12381_g1_msm_uncompressed",
                             {{points, n * 96}, {scalars, n * 32}});
  if (!res) return 1;
  if (res == Py_None) { Py_DECREF(res); return 1; }
  char* b; Py_ssize_t l;
  if (PyBytes_AsStringAndSize(res, &b, &l) || l != 96) {
    Py_XDECREF(res); return 1;
  }
  std::memcpy(out, b, 96);
  Py_DECREF(res);
  return 0;
}

// ---------------------------------------------------------------------
// Low-level per-curve ops (host-int implementations in capi)
// ---------------------------------------------------------------------

static int ll_call2(const char* pyfn, const char* op, byte* out,
                    size_t outlen, const byte* a, size_t alen,
                    const byte* b, size_t blen) {
  ensure_python();
  Gil gil;
  PyObject* f = get_attr("constantine_tpu.capi", pyfn);
  if (!f) return 1;
  PyObject* res;
  if (b)
    res = PyObject_CallFunction(f, "sy#y#", op,
        reinterpret_cast<const char*>(a), (Py_ssize_t)alen,
        reinterpret_cast<const char*>(b), (Py_ssize_t)blen);
  else
    res = PyObject_CallFunction(f, "sy#", op,
        reinterpret_cast<const char*>(a), (Py_ssize_t)alen);
  Py_DECREF(f);
  if (!res) { PyErr_Print(); return 1; }
  if (res == Py_None) { Py_DECREF(res); return 1; }
  char* buf; Py_ssize_t l;
  if (PyBytes_AsStringAndSize(res, &buf, &l) || (size_t)l != outlen) {
    Py_XDECREF(res); return 1;
  }
  std::memcpy(out, buf, outlen);
  Py_DECREF(res);
  return 0;
}

#define CTT_LL2(curve_fn, pyfn, op, sz) \
  int curve_fn(byte out[sz], const byte a[sz], const byte b[sz]) { \
    return ll_call2(pyfn, op, out, sz, a, sz, b, sz); \
  }
#define CTT_LL1(curve_fn, pyfn, op, sz) \
  int curve_fn(byte out[sz], const byte a[sz]) { \
    return ll_call2(pyfn, op, out, sz, a, sz, nullptr, 0); \
  }

CTT_LL2(ctt_bls12381_fp_add, "bls12381_fp_op", "add", 48)
CTT_LL2(ctt_bls12381_fp_sub, "bls12381_fp_op", "sub", 48)
CTT_LL2(ctt_bls12381_fp_mul, "bls12381_fp_op", "mul", 48)
CTT_LL1(ctt_bls12381_fp_inv, "bls12381_fp_op", "inv", 48)
CTT_LL1(ctt_bls12381_fp_sqrt, "bls12381_fp_op", "sqrt", 48)
CTT_LL2(ctt_bls12381_fr_add, "bls12381_fr_op", "add", 32)
CTT_LL2(ctt_bls12381_fr_sub, "bls12381_fr_op", "sub", 32)
CTT_LL2(ctt_bls12381_fr_mul, "bls12381_fr_op", "mul", 32)
CTT_LL1(ctt_bls12381_fr_inv, "bls12381_fr_op", "inv", 32)
CTT_LL2(ctt_bls12381_g1_add, "bls12381_g1_op", "add", 96)
CTT_LL1(ctt_bls12381_g1_neg, "bls12381_g1_op", "neg", 96)

int ctt_bls12381_g1_scalar_mul(byte out[96], const byte p[96],
                               const byte k[32]) {
  ensure_python();
  Gil gil;
  PyObject* f = get_attr("constantine_tpu.capi", "bls12381_g1_op");
  if (!f) return 1;
  PyObject* res = PyObject_CallFunction(
      f, "sy#y#", "scalar_mul", reinterpret_cast<const char*>(p),
      (Py_ssize_t)96, reinterpret_cast<const char*>(k), (Py_ssize_t)32);
  Py_DECREF(f);
  if (!res) { PyErr_Print(); return 1; }
  if (res == Py_None) { Py_DECREF(res); return 1; }
  char* buf; Py_ssize_t l;
  if (PyBytes_AsStringAndSize(res, &buf, &l) || l != 96) {
    Py_XDECREF(res); return 1;
  }
  std::memcpy(out, buf, 96);
  Py_DECREF(res);
  return 0;
}

int ctt_bls12381_g1_in_subgroup(int* result, const byte a[96]) {
  ensure_python();
  Gil gil;
  PyObject* res = call_bytes("constantine_tpu.capi",
                             "bls12381_g1_in_subgroup", {{a, 96}});
  if (!res) return 1;
  if (res == Py_None) { Py_DECREF(res); return 1; }
  *result = PyObject_IsTrue(res) == 1 ? 1 : 0;
  Py_DECREF(res);
  return 0;
}

// ---------------------------------------------------------------------
// PeerDAS (EIP-7594)
// ---------------------------------------------------------------------

static ctt_eth_kzg_status peerdas_two_out(PyObject* res,
                                          ctt_eth_kzg_cell* cells,
                                          ctt_eth_kzg_proof* proofs) {
  if (!res) return cttEthKzg_RuntimeError;
  if (res == Py_None) { Py_DECREF(res); return cttEthKzg_EccInvalidEncoding; }
  if (!PyTuple_Check(res) || PyTuple_GET_SIZE(res) != 2) {
    Py_DECREF(res); return cttEthKzg_RuntimeError;
  }
  char* b; Py_ssize_t l;
  PyObject* p0 = PyTuple_GET_ITEM(res, 0);
  PyObject* p1 = PyTuple_GET_ITEM(res, 1);
  if (PyBytes_AsStringAndSize(p0, &b, &l) || l != 128 * 2048) {
    Py_DECREF(res); return cttEthKzg_RuntimeError;
  }
  std::memcpy(cells, b, 128 * 2048);
  if (PyBytes_AsStringAndSize(p1, &b, &l) || l != 128 * 48) {
    Py_DECREF(res); return cttEthKzg_RuntimeError;
  }
  std::memcpy(proofs, b, 128 * 48);
  Py_DECREF(res);
  return cttEthKzg_Success;
}

ctt_eth_kzg_status ctt_eth_peerdas_compute_cells_and_kzg_proofs(
    const ctt_eth_kzg_context*, ctt_eth_kzg_cell* cells,
    ctt_eth_kzg_proof* proofs, const ctt_eth_kzg_blob* blob) {
  ensure_python();
  Gil gil;
  PyObject* res = call_bytes("constantine_tpu.capi",
                             "peerdas_compute_cells_and_kzg_proofs",
                             {{blob->raw, sizeof(blob->raw)}});
  return peerdas_two_out(res, cells, proofs);
}

ctt_eth_kzg_status ctt_eth_peerdas_recover_cells_and_kzg_proofs(
    const ctt_eth_kzg_context*, ctt_eth_kzg_cell* cells_out,
    ctt_eth_kzg_proof* proofs_out, const uint64_t* cell_indices,
    const ctt_eth_kzg_cell* cells, size_t n) {
  ensure_python();
  Gil gil;
  PyObject* f = get_attr("constantine_tpu.capi",
                         "peerdas_recover_cells_and_kzg_proofs");
  if (!f) return cttEthKzg_RuntimeError;
  PyObject* li = PyList_New((Py_ssize_t)n);
  PyObject* lc = PyList_New((Py_ssize_t)n);
  for (size_t i = 0; i < n; i++) {
    PyList_SET_ITEM(li, (Py_ssize_t)i,
                    PyLong_FromUnsignedLongLong(cell_indices[i]));
    PyList_SET_ITEM(lc, (Py_ssize_t)i, PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(cells[i].raw), 2048));
  }
  PyObject* res = PyObject_CallFunctionObjArgs(f, li, lc, nullptr);
  Py_DECREF(li); Py_DECREF(lc); Py_DECREF(f);
  if (!res) PyErr_Print();
  return peerdas_two_out(res, cells_out, proofs_out);
}

ctt_eth_kzg_status ctt_eth_peerdas_verify_cell_kzg_proof_batch(
    const ctt_eth_kzg_context*, const ctt_eth_kzg_commitment* commitments,
    const uint64_t* cell_indices, const ctt_eth_kzg_cell* cells,
    const ctt_eth_kzg_proof* proofs, size_t n) {
  ensure_python();
  Gil gil;
  PyObject* f = get_attr("constantine_tpu.capi",
                         "peerdas_verify_cell_kzg_proof_batch");
  if (!f) return cttEthKzg_RuntimeError;
  PyObject* lcm = PyList_New((Py_ssize_t)n);
  PyObject* li = PyList_New((Py_ssize_t)n);
  PyObject* lc = PyList_New((Py_ssize_t)n);
  PyObject* lp = PyList_New((Py_ssize_t)n);
  for (size_t i = 0; i < n; i++) {
    PyList_SET_ITEM(lcm, (Py_ssize_t)i, PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(commitments[i].raw), 48));
    PyList_SET_ITEM(li, (Py_ssize_t)i,
                    PyLong_FromUnsignedLongLong(cell_indices[i]));
    PyList_SET_ITEM(lc, (Py_ssize_t)i, PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(cells[i].raw), 2048));
    PyList_SET_ITEM(lp, (Py_ssize_t)i, PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(proofs[i].raw), 48));
  }
  PyObject* res = PyObject_CallFunctionObjArgs(f, lcm, li, lc, lp, nullptr);
  Py_DECREF(lcm); Py_DECREF(li); Py_DECREF(lc); Py_DECREF(lp); Py_DECREF(f);
  if (!res) { PyErr_Print(); return cttEthKzg_RuntimeError; }
  if (res == Py_None) { Py_DECREF(res); return cttEthKzg_EccInvalidEncoding; }
  int truth = PyObject_IsTrue(res);
  Py_DECREF(res);
  return truth == 1 ? cttEthKzg_Success : cttEthKzg_VerificationFailure;
}

}  // extern "C"
