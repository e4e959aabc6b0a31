#include "lib/phy/upper/channel_coding/crc_calculator_lut_impl.h"
#include <cstdio>
#include <vector>
using namespace srsran;
int main() {
  crc_calculator_lut_impl crc(crc_generator_poly::CRC24A);
  std::vector<uint8_t> data = {1,2,3,4,5,6,7,8};
  auto r = crc.calculate_byte(data);
  printf("%06x\n", (unsigned)r);
  return 0;
}
