// C++ test client for the imcui_tpu HTTP API /v1/extract endpoint.
// Reference contract: imcui/api/test/client.cpp:1-81 — base64 image
// round-trip, APIParams JSON body, keypoint decode + report.
#include <cstdio>
#include <cstdlib>

#include "helper.h"

int main(int argc, char** argv) {
  const std::string host = argc > 1 ? argv[1] : "127.0.0.1";
  const int port = argc > 2 ? std::atoi(argv[2]) : 8001;
  const std::string image =
      argc > 3 ? argv[3]
               : "/root/reference/tests/data/02928139_3448003521.jpg";

  APIParams params;
  params.data.push_back(image_to_base64(image));
  params.max_keypoints.push_back(512);
  params.timestamps.push_back("0");
  params.binarize = true;

  const std::string body = paramsToJson(params);
  std::printf("POST /v1/extract to %s:%d (%zu bytes)\n", host.c_str(), port,
              body.size());
  std::string resp;
  try {
    resp = http_post(host, port, "/v1/extract", body);
  } catch (const std::exception& e) {
    std::fprintf(stderr, "request failed: %s\n", e.what());
    return 1;
  }

  KeyPointResults results = decode_response(resp);
  if (results.keypoints.empty()) {
    std::fprintf(stderr, "no keypoints in response (%zu bytes)\n",
                 resp.size());
    return 2;
  }
  for (size_t i = 0; i < results.keypoints.size(); ++i) {
    const auto& k = results.keypoints[i];
    std::printf("image %zu: %zu keypoints", i, k.size());
    if (!k.empty()) std::printf(", first = (%.1f, %.1f)", k[0].x, k[0].y);
    std::printf("\n");
  }
  return 0;
}
