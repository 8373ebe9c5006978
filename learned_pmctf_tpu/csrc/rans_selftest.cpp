// Self-test binary for the rANS backend, built under ASan/TSan by
// `make test` (race/memory checks for the deferred-thread encoder and
// the concurrent multi-substream decoder).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

extern "C" {
void* pmctf_encoder_create(int multithread, int stream_part);
void pmctf_encoder_destroy(void* h);
void pmctf_encoder_encode_with_indexes(void* h, const int16_t* symbols,
                                       const int16_t* indexes, int n,
                                       const int32_t* cdfs, int cdf_num,
                                       int stride, const int32_t* sizes,
                                       const int32_t* offsets);
void pmctf_encoder_flush(void* h);
int pmctf_encoder_stream_size(void* h);
void pmctf_encoder_get_stream(void* h, uint8_t* out);
void pmctf_encoder_reset(void* h);
void* pmctf_decoder_create(int stream_part);
void pmctf_decoder_destroy(void* h);
void pmctf_decoder_set_stream(void* h, const uint8_t* data, int size);
void pmctf_decoder_decode_stream(void* h, const int16_t* indexes, int n,
                                 const int32_t* cdfs, int cdf_num, int stride,
                                 const int32_t* sizes, const int32_t* offsets,
                                 int16_t* out);
int pmctf_pmf_to_quantized_cdf(const float* pmf, int n, int precision,
                               uint32_t* cdf);
}

int main() {
  std::mt19937 rng(7);

  // one laplace-ish CDF table
  const int nsym = 33;
  std::vector<float> pmf(nsym);
  float total = 0.f;
  for (int i = 0; i < nsym; ++i) {
    const float d = static_cast<float>(i - nsym / 2);
    pmf[i] = std::exp(-std::abs(d) / 3.0f);
    total += pmf[i];
  }
  for (auto& p : pmf) p /= total;
  std::vector<uint32_t> cdf_u(nsym + 1);
  if (pmctf_pmf_to_quantized_cdf(pmf.data(), nsym, 16, cdf_u.data()) != 0) {
    std::fprintf(stderr, "cdf build failed\n");
    return 1;
  }
  std::vector<int32_t> cdf(cdf_u.begin(), cdf_u.end());
  const int32_t sizes[1] = {nsym + 1};
  const int32_t offsets[1] = {-(nsym / 2)};

  for (int parts : {1, 2, 4}) {
    for (int mt : {0, 1}) {
      const int n = 40000;
      std::vector<int16_t> symbols(n), indexes(n, 0);
      std::uniform_int_distribution<int> dist(-nsym / 2 - 4, nsym / 2 + 4);
      for (auto& s : symbols) s = static_cast<int16_t>(dist(rng));

      void* enc = pmctf_encoder_create(mt, parts);
      pmctf_encoder_encode_with_indexes(enc, symbols.data(), indexes.data(),
                                        n, cdf.data(), 1, nsym + 1, sizes,
                                        offsets);
      pmctf_encoder_flush(enc);
      const int sz = pmctf_encoder_stream_size(enc);
      std::vector<uint8_t> stream(sz);
      pmctf_encoder_get_stream(enc, stream.data());
      pmctf_encoder_destroy(enc);

      void* dec = pmctf_decoder_create(parts);
      pmctf_decoder_set_stream(dec, stream.data(), sz);
      std::vector<int16_t> out(n);
      pmctf_decoder_decode_stream(dec, indexes.data(), n, cdf.data(), 1,
                                  nsym + 1, sizes, offsets, out.data());
      pmctf_decoder_destroy(dec);

      for (int i = 0; i < n; ++i) {
        if (out[i] != symbols[i]) {
          std::fprintf(stderr, "mismatch parts=%d mt=%d i=%d %d != %d\n",
                       parts, mt, i, out[i], symbols[i]);
          return 1;
        }
      }
      std::printf("roundtrip ok: parts=%d mt=%d bytes=%d\n", parts, mt, sz);
    }
  }
  return 0;
}
