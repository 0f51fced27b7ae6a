// C API over nc3.{h,cc} for ctypes binding (ecckd_tpu/io/nc3_native.py).
// pybind11 is unavailable in this environment; a flat extern "C" surface
// with a thread-local error string keeps the binding dependency-free.
#include <cstring>
#include <string>
#include <vector>

#include "nc3.h"

namespace {
thread_local std::string g_err;

nc3::Reader* R(void* h) { return static_cast<nc3::Reader*>(h); }
nc3::Writer* W(void* h) { return static_cast<nc3::Writer*>(h); }

const nc3::Att* find_att(const std::vector<nc3::Att>& atts,
                         const char* name) {
  for (const auto& a : atts)
    if (a.name == name) return &a;
  return nullptr;
}
}  // namespace

extern "C" {

const char* nc3_error() { return g_err.c_str(); }

void* nc3_open(const char* path) {
  return nc3::Reader::Open(path, &g_err);
}

void nc3_close(void* h) { delete R(h); }

int nc3_num_dims(void* h) { return (int)R(h)->dims().size(); }

const char* nc3_dim_name(void* h, int i) {
  return R(h)->dims()[i].name.c_str();
}

long long nc3_dim_size(void* h, int i) {
  const nc3::Dim& d = R(h)->dims()[i];
  return d.is_record ? R(h)->numrecs() : d.size;
}

int nc3_num_vars(void* h) { return (int)R(h)->vars().size(); }

const char* nc3_var_name(void* h, int i) {
  return R(h)->vars()[i].name.c_str();
}

int nc3_var_id(void* h, const char* name) { return R(h)->var_id(name); }

int nc3_var_ndims(void* h, int vid) {
  return (int)R(h)->vars()[vid].dimids.size();
}

int nc3_var_type(void* h, int vid) { return R(h)->vars()[vid].type; }

void nc3_var_shape(void* h, int vid, long long* out) {
  auto s = R(h)->var_shape(vid);
  for (size_t i = 0; i < s.size(); ++i) out[i] = s[i];
}

int nc3_read_var_double(void* h, int vid, double* out) {
  return R(h)->read_var_double(vid, out, &g_err) ? 0 : -1;
}

// vid -1: global attributes.  Returns payload length or -1 if absent.
int nc3_get_att_text(void* h, int vid, const char* name, char* buf,
                     int buflen) {
  const auto& atts = vid < 0 ? R(h)->gatts() : R(h)->vars()[vid].atts;
  const nc3::Att* a = find_att(atts, name);
  if (!a || a->type != nc3::NC_CHAR) return -1;
  int n = (int)a->text.size();
  if (buf && buflen > 0) {
    int c = n < buflen - 1 ? n : buflen - 1;
    std::memcpy(buf, a->text.data(), c);
    buf[c] = 0;
  }
  return n;
}

int nc3_get_att_double(void* h, int vid, const char* name, double* out,
                       int maxn) {
  const auto& atts = vid < 0 ? R(h)->gatts() : R(h)->vars()[vid].atts;
  const nc3::Att* a = find_att(atts, name);
  if (!a || a->type == nc3::NC_CHAR) return -1;
  int n = (int)a->values.size();
  for (int i = 0; i < n && i < maxn; ++i) out[i] = a->values[i];
  return n;
}

// --- writer ---------------------------------------------------------------

void* nc3w_create(const char* path) { return new nc3::Writer(path); }

int nc3w_def_dim(void* w, const char* name, long long size) {
  return W(w)->def_dim(name, size);
}

int nc3w_def_var(void* w, const char* name, int nctype, int ndims,
                 const int* dimids) {
  return W(w)->def_var(name, nctype,
                       std::vector<int32_t>(dimids, dimids + ndims));
}

void nc3w_put_att_text(void* w, int vid, const char* name,
                       const char* value) {
  W(w)->put_att_text(vid, name, value);
}

int nc3w_put_var_double(void* w, int vid, const double* data,
                        long long n) {
  return W(w)->put_var_double(vid, data, n, &g_err) ? 0 : -1;
}

int nc3w_finish(void* w) {
  bool ok = W(w)->finish(&g_err);
  delete W(w);
  return ok ? 0 : -1;
}

int nc3_update_var_double(const char* path, const char* name,
                          const double* data, long long n) {
  return nc3::UpdateVarDouble(path, name, data, n, &g_err) ? 0 : -1;
}

}  // extern "C"
